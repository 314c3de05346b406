package graft.streaming

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** O4 backend plumbing: the MetricsProtocol mirror
  * (metrics_interface.clj:41-44) — fan-out from the registry, the statsd
  * wire format, config surface, and terminate. */
class MetricsSinkSpec extends AnyFunSuite {

  private final class FakeSink extends MetricsSink {
    val counters = mutable.ArrayBuffer.empty[(String, String, Map[String, String], Long)]
    val timings = mutable.ArrayBuffer.empty[(String, String, Map[String, String], Long)]
    val gaugesSeen = mutable.ArrayBuffer.empty[(String, String, Map[String, String], Double)]
    var terminated = false
    override def updateCounter(ns: String, m: String, tags: Map[String, String], v: Long): Unit =
      counters += ((ns, m, tags, v))
    override def updateTiming(ns: String, m: String, tags: Map[String, String], v: Long): Unit =
      timings += ((ns, m, tags, v))
    override def updateGauge(ns: String, m: String, tags: Map[String, String], v: Double): Unit =
      gaugesSeen += ((ns, m, tags, v))
    override def terminate(): Unit = terminated = true
  }

  test("registry fans out increments with (namespace, metric) split and tags") {
    val reg = new MetricsRegistry
    val sink = new FakeSink
    reg.addSink(sink)
    reg.recordDispatch("booking", Dispatch.Counts(
      success = 3, skip = 1, retried = 2, deadLettered = 0, toChannels = 0))
    val succ = sink.counters.find(_._2 == "success").get
    assert(succ._1 == "booking.message")
    assert(succ._3 == Map("topic_entity" -> "booking"))
    assert(succ._4 == 3L)
    // local snapshot unchanged by the fan-out
    assert(reg.count("booking.message.success") == 3L)
    assert(reg.count("booking.message.retry") == 2L)
  }

  test("dot-less names land in an empty namespace") {
    val reg = new MetricsRegistry
    val sink = new FakeSink
    reg.addSink(sink)
    reg.increment("heartbeat")
    assert(sink.counters.toList == List(("", "heartbeat", Map.empty, 1L)))
  }

  test("timing records a local gauge AND pushes a timing sample") {
    val reg = new MetricsRegistry
    val sink = new FakeSink
    reg.addSink(sink)
    reg.timing("route.trigger", 42L)
    assert(sink.timings.toList == List(("route", "trigger", Map.empty, 42L)))
    assert(reg.snapshot()("route.trigger") == 42.0)
  }

  test("a gauge sharing a counter's name cannot SHADOW the monotonic " +
      "count in snapshot(): the collision exports the gauge under " +
      "'<name>.gauge' so both values stay visible and snapshot agrees " +
      "with typedSnapshot") {
    val reg = new MetricsRegistry
    reg.increment("route.trigger", 3)
    reg.timing("route.trigger", 42L) // last-value gauge, same name
    val snap = reg.snapshot()
    assert(snap("route.trigger") == 3.0,
      s"the counter must win the bare name: $snap")
    assert(snap("route.trigger.gauge") == 42.0, snap)
    // no collision → gauge keeps its bare name (existing contract)
    reg.timing("route.latency", 7L)
    assert(reg.snapshot()("route.latency") == 7.0)
  }

  test("the collision rename PROBES for a free key: a counter already " +
      "named '<name>.gauge' is not overwritten by the renamed gauge " +
      "(that recreated the silent shadowing one level deeper)") {
    val reg = new MetricsRegistry
    reg.increment("route.trigger", 3)
    reg.increment("route.trigger.gauge", 9) // literal counter at the
    reg.timing("route.trigger", 42L)        // rename's landing spot
    val snap = reg.snapshot()
    assert(snap("route.trigger") == 3.0, snap)
    assert(snap("route.trigger.gauge") == 9.0,
      s"the literal counter must keep its name: $snap")
    assert(snap("route.trigger.gauge.2") == 42.0,
      s"the displaced gauge probes to the next free key: $snap")
    // all three values visible — nothing silently dropped
    assert(snap.size == reg.typedSnapshot()._1.size
      + reg.typedSnapshot()._2.size)
  }

  test("terminateSinks terminates and detaches every sink") {
    val reg = new MetricsRegistry
    val sink = new FakeSink
    reg.addSink(sink)
    reg.terminateSinks()
    assert(sink.terminated)
    reg.increment("after.terminate")
    assert(sink.counters.isEmpty)
  }

  // ------------------------------------------------------------- statsd wire

  /** Receives `n` datagrams on a loopback socket. */
  private def withUdpServer[A](n: Int)(f: Int => A): (A, List[String]) = {
    val server = new DatagramSocket()
    server.setSoTimeout(5000)
    try {
      val res = f(server.getLocalPort)
      val lines = (1 to n).map { _ =>
        val p = new DatagramPacket(new Array[Byte](1024), 1024)
        server.receive(p)
        new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
      }.toList
      (res, lines)
    } finally server.close()
  }

  test("StatsdSink emits the statsd line protocol with DogStatsD tags") {
    val (_, lines) = withUdpServer(3) { port =>
      val sink = new StatsdSink("127.0.0.1", port)
      sink.updateCounter("booking.message", "success",
        Map("topic_entity" -> "booking", "actor" -> "app"), 3)
      sink.updateTiming("booking", "trigger", Map.empty, 250)
      sink.updateGauge("booking", "lag", Map.empty, 1.5)
      sink.terminate()
    }
    assert(lines(0) ==
      "graft.booking.message.success:3|c|#actor:app,topic_entity:booking")
    assert(lines(1) == "graft.booking.trigger:250|ms")
    assert(lines(2) == "graft.booking.lag:1.5|g")
  }

  test("StatsdSink renders integral gauges without a decimal point") {
    val (_, lines) = withUdpServer(1) { port =>
      val sink = new StatsdSink("127.0.0.1", port)
      sink.updateGauge("q", "rows", Map.empty, 1.0e7)
      sink.terminate()
    }
    assert(lines.head == "graft.q.rows:10000000|g")
  }

  test("non-finite gauges are DROPPED, never thrown: BigDecimal(NaN) " +
      "threw NumberFormatException outside the swallowed-IO try, so a " +
      "user-computed 0/0 ratio gauge killed the streaming query") {
    val (_, lines) = withUdpServer(1) { port =>
      val sink = new StatsdSink("127.0.0.1", port)
      sink.updateGauge("q", "ratio", Map.empty, Double.NaN)
      sink.updateGauge("q", "inf", Map.empty, Double.PositiveInfinity)
      sink.updateGauge("q", "ninf", Map.empty, Double.NegativeInfinity)
      sink.updateGauge("q", "ok", Map.empty, 2.5)
      sink.terminate()
    }
    assert(lines.head == "graft.q.ok:2.5|g",
      s"only the finite gauge may arrive: ${lines.mkString(";")}")
  }

  test("negative gauges are an absolute SET, not a statsd delta: the " +
      "line protocol reads a sign-prefixed gauge as an adjustment, so " +
      "the standard zero-set precedes the value in the SAME datagram") {
    val (_, lines) = withUdpServer(1) { port =>
      val sink = new StatsdSink("127.0.0.1", port)
      sink.updateGauge("q", "drift", Map("h" -> "a"), -5.0)
      sink.terminate()
    }
    assert(lines.head == "graft.q.drift:0|g|#h:a\ngraft.q.drift:-5|g|#h:a",
      lines.head)
  }

  test("an unresolvable statsd host never throws: not at construction " +
      "(engine boot registers the sink — a DNS blip must not kill boot) " +
      "nor per send; metrics drop silently until resolution succeeds") {
    // '[' prefix fails InetAddress' literal parse immediately — an
    // UnknownHostException without a (potentially slow) DNS query
    val sink = new StatsdSink("[invalid", 8125)
    sink.updateCounter("a", "b", Map.empty, 1L)
    sink.updateGauge("a", "g", Map.empty, 1.0)
    sink.updateTiming("a", "t", Map.empty, 5L)
    sink.terminate()
  }

  test("end-to-end: registry with a StatsdSink pushes dispatch counts over UDP") {
    val (_, lines) = withUdpServer(5) { port =>
      val reg = new MetricsRegistry
      reg.addSink(new StatsdSink("127.0.0.1", port))
      reg.recordDispatch("payments", Dispatch.Counts(
        success = 7, skip = 0, retried = 1, deadLettered = 2, toChannels = 0))
      reg.terminateSinks()
    }
    assert(lines.contains(
      "graft.payments.message.success:7|c|#topic_entity:payments"))
    assert(lines.contains(
      "graft.payments.message.dead_letter:2|c|#topic_entity:payments"))
  }

  test("statsd config section loads from file text (config.clj :statsd)") {
    val cfg = ConfigLoader.load(
      """graft {
        |  statsd {
        |    host = "telegraf.local"
        |    port = 8200
        |    enabled = true
        |  }
        |}""".stripMargin, env = Map.empty)
    assert(cfg.statsd == StatsdConfig("telegraf.local", 8200, enabled = true))
    // absent section → disabled defaults
    val dflt = ConfigLoader.load("graft {}", env = Map.empty)
    assert(dflt.statsd == StatsdConfig())
  }

  test("unknown statsd keys are linted") {
    val bad = ConfigLoader.unknownKeys(ConfigLoader.parse(
      """graft { statsd { hosst = "x" } }"""))
    assert(bad == Seq("graft.statsd.hosst"))
  }
}
