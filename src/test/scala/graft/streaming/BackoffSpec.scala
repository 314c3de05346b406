package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the retry state machine (E3) and backoff formulas
  * (E4/E5) — mirroring messaging/producer.clj:175-224,288-293. Uses
  * scalacheck's engine directly (no scalatestplus bridge in this build). */
class BackoffSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val cfgGen = for {
    count <- Gen.choose(1, 25)
    timeout <- Gen.choose(100L, 10000L)
  } yield RetryConfig(enabled = true, count = count,
    backoffType = BackoffType.Exponential, queueTimeoutMs = timeout)

  test("linear timeout is constant at queueTimeoutMs (config.clj:40 default)") {
    check(Prop.forAll(cfgGen, Gen.choose(0, 25)) { (cfg, remaining) =>
      val c = cfg.copy(backoffType = BackoffType.Linear)
      RetryEngine.timeoutMs(c, remaining) == c.queueTimeoutMs
    })
  }

  test("exponential timeout follows (2^n - 1) * timeout with clamped exponent") {
    check(Prop.forAll(cfgGen, Gen.choose(0, 25)) { (cfg, remaining) =>
      val exp = math.max(1, math.min(25, cfg.count) - remaining)
      val expected = ((math.pow(2, exp.toDouble) - 1) * cfg.queueTimeoutMs).toLong
      RetryEngine.timeoutMs(cfg, remaining) == expected
    })
  }

  test("exponential timeout grows monotonically as remaining decreases") {
    val cfg = RetryConfig(enabled = true, count = 10,
      backoffType = BackoffType.Exponential, queueTimeoutMs = 1000)
    val timeouts = (0 to 10).reverse.map(r => RetryEngine.timeoutMs(cfg, r))
    assert(timeouts == timeouts.sorted)
    // first failure (remaining = count) → exponent clamps to 1 → 1×timeout
    assert(RetryEngine.timeoutMs(cfg, 10) == 1000)
    // last chance (remaining = 0) → exponent = count → (2^10 − 1)×timeout
    assert(RetryEngine.timeoutMs(cfg, 0) == 1023000)
  }

  test("exponent never exceeds MAX_EXPONENTIAL_RETRIES (producer.clj:20)") {
    val cfg = RetryConfig(enabled = true, count = 25,
      backoffType = BackoffType.Exponential, queueTimeoutMs = 1)
    assert(RetryEngine.timeoutMs(cfg, 0) == (math.pow(2, 25).toLong - 1))
  }
}
