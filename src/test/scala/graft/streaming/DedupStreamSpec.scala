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

  private case class Doc(doc_id: Long, text: String)

  test("streaming near-dup: a later document colliding with a held LSH " +
      "bucket is flagged against the first arrival; distinct docs are not") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[Doc]
    val out = Pipeline.streamingNearDup("doc_id", "text")(in.toDF())
    val name = s"neardup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // the ProcessingTimeTimeout keeps the stateful query scheduling
      // batches, so processAllAvailable never settles — poll the sink
      def flagged() = spark.table(name)
        .select("dup_id", "canonical_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def awaitBatches(n: Long): Unit = {
        val deadline = System.currentTimeMillis + 30000
        while (q.recentProgress.map(_.batchId).distinct.length < n
            && System.currentTimeMillis < deadline) Thread.sleep(200)
      }
      // batch 1: the canonical doc + an unrelated doc
      in.addData(
        Doc(1L, "the quick brown fox jumps over the lazy dog tonight"),
        Doc(9L, "completely different words about spark shuffles and joins"))
      awaitBatches(1)
      assert(flagged().isEmpty, "no dups yet")
      // batch 2: an identical copy (all 4 bands collide) + another new doc
      in.addData(
        Doc(2L, "the quick brown fox jumps over the lazy dog tonight"),
        Doc(7L, "yet another unrelated document with its own vocabulary"))
      val deadline = System.currentTimeMillis + 30000
      while (flagged().isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(200)
      assert(flagged() == Set((2L, 1L)), s"got ${flagged()}")
    } finally q.stop()
  }
}
