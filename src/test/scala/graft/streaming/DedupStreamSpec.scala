package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup within the watermark horizon: duplicates of a key seen
  * inside the horizon are dropped; state expires with the watermark
  * (bounded memory — the property batch dropDuplicates lacks on streams). */
class DedupStreamSpec extends SparkSuite {

  test("duplicate keys within the horizon collapse to the first arrival") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[DedupRec]
    in.addData(
      DedupRec("a", ts("2024-01-01 00:00:00"), "first"),
      DedupRec("a", ts("2024-01-01 00:03:00"), "dup-within-horizon"),
      DedupRec("b", ts("2024-01-01 00:04:00"), "other-key"),
      DedupRec("a", ts("2024-01-01 00:05:00"), "another-dup"))
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

  test("streaming near-dup: a later document colliding with a held LSH " +
      "bucket is flagged against the first arrival; distinct docs are not") {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val in = MemoryStream[DedupDoc]
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
        DedupDoc(1L, "the quick brown fox jumps over the lazy dog tonight"),
        DedupDoc(9L, "completely different words about spark shuffles and joins"))
      awaitBatches(1)
      assert(flagged().isEmpty, "no dups yet")
      // batch 2: an identical copy (all 4 bands collide) + another new doc
      in.addData(
        DedupDoc(2L, "the quick brown fox jumps over the lazy dog tonight"),
        DedupDoc(7L, "yet another unrelated document with its own vocabulary"))
      val deadline = System.currentTimeMillis + 30000
      while (flagged().isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(200)
      assert(flagged() == Set((2L, 1L)), s"got ${flagged()}")
    } finally q.stop()
  }
}

/** Top-level so Spark derives a clean product encoder: a spec-nested case
  * class closes over the suite instance, which breaks expression codegen
  * ("Expr codegen error" -> interpreted fallback) and would certify the
  * interpreted state path instead of the codegen'd one (same hoist as
  * PlateauEv in StreamStateBoundsSpec). */
case class DedupRec(k: String, ts: java.sql.Timestamp, v: String)

/** Top-level for codegen'd encoders — see [[DedupRec]]. */
case class DedupDoc(doc_id: Long, text: String)
