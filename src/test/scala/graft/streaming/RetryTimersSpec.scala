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
}
