package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end retry flow through the engine: origin stream → always-fail
  * handler → retry topic hops → dead letter, mirroring the reference's
  * delay→instant→…→dead-letter cycle (doc/retries_and_queues.md topology). */
class RetryFlowSpec extends SparkSuite {

  test("failing message cycles retry topic until count exhausts into DLQ") {
    val dir = tmpDir("retryflow")
    val topics = new FileTopicIO(s"$dir/topics")
    val route = StreamRouteConfig(
      topicEntity = "app", originTopic = "app_origin",
      retry = RetryConfig(enabled = true, count = 2,
        backoffType = BackoffType.Linear, queueTimeoutMs = 0L))
    val cfg = EngineConfig(streamRoutes = Map("app" -> route))
    val engine = new GraftEngine(spark, cfg, topics, s"$dir/ckpt")
    val alwaysFail = Dispatch.ExprHandler(lit("retry"))

    // seed one message on the origin topic
    topics.append(envelopes("app", Seq(("k", "poison",
      new java.sql.Timestamp(System.currentTimeMillis)))), "app_origin")

    // stream route picks it up, handler fails → retry topic with count 1
    engine.startStreamRoute(route, identity, alwaysFail,
      Trigger.AvailableNow()).awaitTermination()
    assert(topics.read(spark, "app_retry").count() == 1)
    assert(topics.read(spark, "app_retry").collect()(0)
      .getAs[Int]("retryCount") == 1)

    // retry hop 1: due (timeout 0) → fails again → count 0
    engine.startRetryReader(route, identity, alwaysFail, Trigger.AvailableNow())
      .awaitTermination()
    engine.stopRoute("retry-app")
    val afterHop1 = topics.read(spark, "app_retry")
      .orderBy(col("offset").desc).collect()
    assert(afterHop1.head.getAs[Int]("retryCount") == 0)

    // retry hop 2: count 0 → dead letter with count restored to 2
    engine.startRetryReader(route, identity, alwaysFail, Trigger.AvailableNow())
      .awaitTermination()
    engine.stopRoute("retry-app")
    val dead = topics.read(spark, "app_dead_letter").collect()
    assert(dead.length == 1)
    assert(dead(0).getAs[Int]("retryCount") == 2)
    assert(engine.metrics.count("app.message.dead_letter") == 1)
    engine.stopAll()
  }

  test("not-yet-due retries are requeued, due ones released") {
    val dir = tmpDir("retrydue")
    val topics = new FileTopicIO(s"$dir/topics")
    val now = System.currentTimeMillis
    val sess = spark
    import sess.implicits._
    val rows = Seq(
      Envelope("a".getBytes, "due".getBytes, "app_retry", 0, 0L,
        new java.sql.Timestamp(now), "app", Some(1),
        Some(new java.sql.Timestamp(now - 1000)), None),
      Envelope("b".getBytes, "later".getBytes, "app_retry", 0, 1L,
        new java.sql.Timestamp(now), "app", Some(1),
        Some(new java.sql.Timestamp(now + 3600 * 1000)), None)).toDF()
    val due = RetryEngine.due(rows, RetryEngine.pinnedNow()).collect()
    assert(due.length == 1)
    assert(new String(due(0).getAs[Array[Byte]]("value")) == "due")
  }

  test("pinned now makes due/notDue an exact partition even when the two " +
      "jobs run at different wall-clock times (no duplicate release)") {
    val sess = spark
    import sess.implicits._
    val now = System.currentTimeMillis
    // a record that becomes due 150 ms from now — inside the window between
    // the requeue job and the dispatch job in the old current_timestamp()
    // formulation, which processed it twice
    val rows = Seq(
      Envelope("a".getBytes, "past".getBytes, "app_retry", 0, 0L,
        new java.sql.Timestamp(now), "app", Some(1),
        Some(new java.sql.Timestamp(now - 1000)), None),
      Envelope("b".getBytes, "imminent".getBytes, "app_retry", 0, 1L,
        new java.sql.Timestamp(now), "app", Some(1),
        Some(new java.sql.Timestamp(now + 150)), None),
      Envelope("c".getBytes, "far".getBytes, "app_retry", 0, 2L,
        new java.sql.Timestamp(now), "app", Some(1),
        Some(new java.sql.Timestamp(now + 3600 * 1000)), None)).toDF()
    val pinned = RetryEngine.pinnedNow()
    val notDueRows = RetryEngine.notDue(rows, pinned).collect()
    Thread.sleep(300) // "imminent" is now past due on the wall clock
    val dueRows = RetryEngine.due(rows, pinned).collect()
    val dueVals = dueRows.map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    val notDueVals =
      notDueRows.map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(dueVals == Set("past"))
    assert(notDueVals == Set("imminent", "far"))
    assert((dueVals & notDueVals).isEmpty)
    assert(dueRows.length + notDueRows.length == 3)
  }
}
