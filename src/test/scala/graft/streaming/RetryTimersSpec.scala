package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Exact-time retry release (flatMapGroupsWithState + processing-time
  * timers): due records pass through immediately; scheduled records park in
  * state and are emitted when their `nextAttemptAt` arrives — without being
  * re-appended to the topic each trigger. */
class RetryTimersSpec extends SparkSuite {

  private def env(off: Long, dueInMs: Option[Long]): Envelope = {
    val now = System.currentTimeMillis
    Envelope(s"k$off".getBytes, s"v$off".getBytes, "t", 0, off,
      new java.sql.Timestamp(now), "t",
      retryCount = Some(1),
      nextAttemptAt = dueInMs.map(d => new java.sql.Timestamp(now + d)))
  }

  test("due records release immediately, scheduled ones at their timer") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[Envelope]
    val released = RetryTimers.release(in.toDS())
    val q = released.writeStream
      .format("memory").queryName("retry_timers_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      in.addData(
        env(1, None),             // no schedule → due now
        env(2, Some(-1000L)),     // past due → due now
        env(3, Some(8000L)))      // parked, fires in ~8 s
      // NOTE: processAllAvailable() never settles here — the registered
      // timer keeps the stateful query running batches — so poll the sink.
      def sink(): Set[Long] = spark.sql("SELECT offset FROM retry_timers_out")
        .collect().map(_.getLong(0)).toSet
      def awaitUntil(deadline: Long)(cond: => Boolean): Unit =
        while (!cond && System.currentTimeMillis < deadline) Thread.sleep(200)
      awaitUntil(System.currentTimeMillis + 20000)(sink() == Set(1L, 2L))
      val immediate = sink()
      assert(immediate == Set(1L, 2L),
        s"due records should release immediately; got $immediate")
      awaitUntil(System.currentTimeMillis + 20000)(sink().contains(3L))
      assert(sink() == Set(1L, 2L, 3L),
        s"parked record did not release by its timer; got ${sink()}")
    } finally q.stop()
  }

  test("a now-due replay clears the parked state so the stale timer cannot " +
      "release the same record a second time") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[Envelope]
    val q = RetryTimers.release(in.toDS()).writeStream
      .format("memory").queryName("retry_replay_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      def emitted(): Long = spark.sql(
        "SELECT count(*) FROM retry_replay_out WHERE offset = 5").collect()(0).getLong(0)
      // 1) original delivery parks with a ~6 s timer
      in.addData(env(5, Some(6000L)))
      Thread.sleep(1500) // let the parking batch commit (100 ms trigger)
      assert(emitted() == 0L)
      // 2) source replay of the same record identity, now past due
      in.addData(env(5, Some(-1000L)))
      val deadline = System.currentTimeMillis + 10000
      while (emitted() < 1L && System.currentTimeMillis < deadline)
        Thread.sleep(200)
      assert(emitted() == 1L, "replayed due record must release once")
      // 3) ride past the original timer's fire time: no second release
      Thread.sleep(8000)
      assert(emitted() == 1L,
        "stale timer re-released a record its replay already emitted")
    } finally q.stop()
  }
}
