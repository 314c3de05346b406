package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Input row for the streaming funnel — top-level for encoder derivation. */
case class FunEv(user_id: Long, ts: Timestamp, event_type: String)

/** Pipeline.streamingFunnel: stage depth advances only on the NEXT stage
  * in order (a12's ordered-funnel contract), resumes across micro-batches
  * from one integer of state per user, and intra-batch out-of-order
  * events resolve in event-time order. */
class FunnelStreamSpec extends SparkSuite {

  private def t(s: String) = Timestamp.valueOf(s)

  test("ordered advance, out-of-order intra-batch resolution, cross-batch " +
      "resume, and no skip-ahead") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunEv]
    val out = Pipeline.streamingFunnel(Seq("view", "click", "purchase"))(
      in.toDF())
    val name = s"funnel_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1: click arrives FIRST in the batch but view has the earlier
      // event time — the event-time walk must advance view then click.
      // user 2: purchase before any view — no advance at all (no
      // skip-ahead).
      in.addData(
        FunEv(1L, t("2026-01-01 10:01:00"), "click"),
        FunEv(1L, t("2026-01-01 10:00:00"), "view"),
        FunEv(2L, t("2026-01-01 10:00:00"), "purchase"))
      q.processAllAvailable()
      // batch 2: user 1 completes with purchase (depth 3 from state);
      // user 2 starts properly with a view (depth 1)
      in.addData(
        FunEv(1L, t("2026-01-01 10:05:00"), "purchase"),
        FunEv(2L, t("2026-01-01 10:06:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table(name)
        .orderBy("user_id", "stage_depth")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getTimestamp(2).toString.take(19)))
        .toSeq
      assert(rows == Seq(
        (1L, 1, "2026-01-01 10:00:00"),
        (1L, 2, "2026-01-01 10:01:00"),
        (1L, 3, "2026-01-01 10:05:00"),
        (2L, 1, "2026-01-01 10:06:00")),
        rows.mkString("\n"))
      val p = q.lastProgress
      assert(p.stateOperators(0).numRowsTotal == 2L,
        "one depth integer per user")
    } finally q.stop()
  }

  test("equal timestamps tiebreak by stage index: a view and click at the " +
      "same instant advance view-then-click (depth reaches 2), not the " +
      "alphabetical walk that would consume the view and miss the click") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunEv]
    val out = Pipeline.streamingFunnel(Seq("view", "click", "purchase"))(
      in.toDF())
    val name = s"funnel_tie_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(
        FunEv(9L, t("2026-01-01 10:00:00"), "click"),
        FunEv(9L, t("2026-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      val depths = spark.table(name).collect().map(_.getInt(1)).sorted.toSeq
      assert(depths == Seq(1, 2), s"expected view+click both advance: $depths")
    } finally q.stop()
  }

  test("stateTtl expires idle users: state-row count drops to 0 after the " +
      "TTL while results already emitted stand") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunEv]
    val out = Pipeline.streamingFunnel(Seq("view", "click"),
      stateTtl = Some("2 seconds"))(in.toDF())
    val name = s"funnel_ttl_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(
        FunEv(1L, t("2026-01-01 10:00:00"), "view"),
        FunEv(2L, t("2026-01-01 10:00:00"), "view"))
      // timer-driven query: poll the progress with a deadline (skill
      // gotcha — processAllAvailable never settles on timeout batches)
      var deadline = System.currentTimeMillis + 60000
      while (spark.table(name).count() < 2
          && System.currentTimeMillis < deadline) Thread.sleep(200)
      assert(spark.table(name).count() == 2, "both views advance")
      def stateRows: Long = {
        val p = q.lastProgress
        if (p == null || p.stateOperators.isEmpty) -1L
        else p.stateOperators(0).numRowsTotal
      }
      deadline = System.currentTimeMillis + 60000
      while (stateRows != 0L && System.currentTimeMillis < deadline)
        Thread.sleep(500)
      assert(stateRows == 0L,
        s"idle users must expire after the TTL, still holding $stateRows")
      assert(spark.table(name).count() == 2, "emitted rows are untouched")
    } finally q.stop()
  }

  test("under churn (a stream of ever-new users) the TTL keeps funnel " +
      "state at a plateau far below the total user population") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[FunEv]
    val out = Pipeline.streamingFunnel(Seq("view", "click"),
      stateTtl = Some("1 second"))(in.toDF())
    val name = s"funnel_churn_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val batches = 12
    val perBatch = 50
    try {
      for (b <- 0 until batches) {
        in.addData((0 until perBatch).map(i =>
          FunEv(b * 1000L + i, t("2026-01-01 10:00:00"), "view")))
        // poll the sink, never processAllAvailable — timer-driven
        // queries keep scheduling batches forever (skill gotcha)
        val want = (b + 1).toLong * perBatch
        val dl = System.currentTimeMillis + 30000
        while (spark.table(name).count() < want
            && System.currentTimeMillis < dl) Thread.sleep(100)
        Thread.sleep(1200) // past the TTL: prior cohorts become evictable
      }
      val total = batches.toLong * perBatch
      // timer batches keep firing; poll until expiry catches up
      def stateRows: Long = {
        val p = q.lastProgress
        if (p == null || p.stateOperators.isEmpty) Long.MaxValue
        else p.stateOperators.map(_.numRowsTotal).sum
      }
      val deadline = System.currentTimeMillis + 60000
      while (stateRows > total / 3 && System.currentTimeMillis < deadline)
        Thread.sleep(500)
      assert(stateRows <= total / 3,
        s"state must plateau near one cohort, not $stateRows of $total")
      assert(spark.table(name).count() == total, "every view advanced once")
    } finally q.stop()
  }
}
