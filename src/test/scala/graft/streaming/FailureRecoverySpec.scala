package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicInteger

object FailureRecoverySpec {
  // static so executors/restarts share it within the JVM
  val attempts = new AtomicInteger(0)
}

/** E12 Restart policy + E4 real backoff elapse, end-to-end. */
class FailureRecoverySpec extends SparkSuite {

  private def now = new java.sql.Timestamp(System.currentTimeMillis)

  test("Restart policy re-launches a failed route from its checkpoint (E12 :replace-thread)") {
    val dir = tmpDir("restart")
    val topics = new FileTopicIO(s"$dir/topics")
    val route = StreamRouteConfig("rr", "rr_origin")
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map("rr" -> route)), topics, s"$dir/ckpt",
      failurePolicy = FailurePolicy.Restart)
    topics.append(envelopes("rr", Seq(("k", "v", now))), "rr_origin")

    FailureRecoverySpec.attempts.set(0)
    val flaky = new Dispatch.Handler {
      def apply(b: org.apache.spark.sql.DataFrame) = {
        if (FailureRecoverySpec.attempts.incrementAndGet() == 1)
          throw new RuntimeException("transient failure")
        b.withColumn("disposition", lit("success"))
      }
    }
    val q = engine.startStreamRoute(route, identity, flaky,
      Trigger.AvailableNow())
    intercept[Exception] { q.awaitTermination() }
    // the listener restarts the route asynchronously; the restarted query
    // replays the failed micro-batch from the checkpoint and succeeds
    val deadline = System.currentTimeMillis + 20000
    while (engine.metrics.count("rr.message.success") == 0
        && System.currentTimeMillis < deadline) Thread.sleep(200)
    assert(engine.metrics.count("rr.query.failed") >= 1)
    assert(engine.metrics.count("rr.message.success") == 1)
    assert(FailureRecoverySpec.attempts.get() >= 2)
    engine.stopAll()
  }

  test("linear backoff holds a not-yet-due retry: requeued untouched, handler not run (E4)") {
    val dir = tmpDir("backoffwait")
    val topics = new FileTopicIO(s"$dir/topics")
    // 60s timeout: far beyond the reader's spin-up, so the record cannot
    // become due mid-test (the due→reprocess path is covered by
    // RetryFlowSpec with timeout 0 and the RetryEngine.due unit test)
    val route = StreamRouteConfig("bw", "bw_origin",
      retry = RetryConfig(enabled = true, count = 2,
        backoffType = BackoffType.Linear, queueTimeoutMs = 60000L))
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map("bw" -> route)), topics, s"$dir/ckpt")
    topics.append(envelopes("bw", Seq(("k", "v", now))), "bw_origin")

    engine.startStreamRoute(route, identity,
      Dispatch.ExprHandler(lit("retry")), Trigger.AvailableNow())
      .awaitTermination()
    val stamped = topics.read(spark, "bw_retry").collect()
    assert(stamped.length == 1)
    val dueAt = stamped(0).getAs[java.sql.Timestamp]("nextAttemptAt")
    assert(dueAt.getTime > System.currentTimeMillis + 30000)

    // reader sees it, requeues it (count/stamp unchanged), handler not run
    engine.startRetryReader(route, identity,
      Dispatch.ExprHandler(lit("retry")), Trigger.AvailableNow())
      .awaitTermination()
    engine.stopRoute("retry-bw")
    assert(engine.metrics.count("bw.message.retry") == 1) // origin hop only
    val requeued = topics.read(spark, "bw_retry")
      .orderBy(col("offset").desc).collect()
    assert(requeued.head.getAs[Int]("retryCount") == 1)
    assert(requeued.head.getAs[java.sql.Timestamp]("nextAttemptAt") == dueAt)
    engine.stopAll()
  }
}
