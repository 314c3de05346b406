package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup within the watermark horizon: duplicates of a key seen
  * inside the horizon are dropped; state expires with the watermark
  * (bounded memory — the property batch dropDuplicates lacks on streams). */
class DedupStreamSpec extends SparkSuite {

  private case class Rec(k: String, ts: java.sql.Timestamp, v: String)

  test("duplicate keys within the horizon collapse to the first arrival") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[Rec]
    in.addData(
      Rec("a", ts("2024-01-01 00:00:00"), "first"),
      Rec("a", ts("2024-01-01 00:03:00"), "dup-within-horizon"),
      Rec("b", ts("2024-01-01 00:04:00"), "other-key"),
      Rec("a", ts("2024-01-01 00:05:00"), "another-dup"))
    val out = Pipeline.dedupWithinWatermark(Seq("k"), tsCol = "ts",
      horizon = "10 minutes")(in.toDF())
    val name = s"dedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table(name).select("k", "v").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == Seq(("a", "first"), ("b", "other-key")),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
