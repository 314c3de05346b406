package graft.streaming

import graft.{SparkSuite, SparkEntry, Tables}
import graft.streaming.EwmaStream.EwmaIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-stream parity for EWMA smoothing: the same events replayed
  * through MemoryStream across several triggers must produce row-for-row
  * the a20 batch query's (ewma, spike) — the third parity proof alongside
  * a03≡q43 sessionization and UpsertSink≡q46 upserts. */
class EwmaStreamSpec extends SparkSuite {

  test("streamed EWMA equals the a20 batch query across trigger boundaries") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext

    // cents via the SAME Spark expression as the batch query, so parity
    // failures can only come from the fold itself
    val rows = Tables(spark, sf0001).events
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .orderBy(col("ts_ms"), col("event_id"))
      .collect()
      .map(r => EwmaIn(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    val input = MemoryStream[EwmaIn]
    val q = EwmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      // three triggers; the global (ts, event_id) order preserves each
      // user's event order across batch boundaries
      rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("ewma_out").collect()
      .map(r => r.getAs[Long]("eventId") ->
        ((r.getAs[Double]("ewma"), r.getAs[Boolean]("spike")))).toMap
    val want = SparkEntry.queries("a20_ewma_smoothing")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Double]("ewma"), r.getAs[Boolean]("spike")))).toMap
    assert(got.size == want.size,
      s"row counts diverged: stream=${got.size} batch=${want.size}")
    val diffs = want.collect {
      case (id, w) if got(id) != w => (id, got(id), w)
    }
    assert(diffs.isEmpty,
      s"stream/batch diverged on ${diffs.size} rows, first: ${diffs.take(3)}")
  }

  test("lookback outside [1, 62] fails at plan construction, not as a " +
      "NaN→BigDecimal NumberFormatException in the executor: den = " +
      "(1L << size) - 1 is 0 at lookback 0 and degenerates past 62 " +
      "(Java shifts are mod 64)") {
    val sess = spark
    import sess.implicits._
    val empty = sess.emptyDataset[EwmaIn]
    intercept[IllegalArgumentException](EwmaStream(empty, lookback = 0))
    intercept[IllegalArgumentException](EwmaStream(empty, lookback = 63))
    intercept[IllegalArgumentException](EwmaStream(empty, lookback = -1))
    EwmaStream(empty, lookback = 62) // boundary constructs fine
  }
}
