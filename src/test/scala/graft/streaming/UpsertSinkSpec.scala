package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** UpsertSink: streaming micro-batches merge into a latest-per-key view,
  * replays are skipped (exactly-once view from at-least-once foreachBatch),
  * and the pointer flip keeps readers on a complete version. */
class UpsertSinkSpec extends SparkSuite {

  private def df(rows: Seq[(Long, String, Long)]) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("k", "v", "ord")
  }

  test("batches merge to latest-per-key; last write wins at equal order") {
    val sink = new UpsertSink(spark, tmpDir("upsert1"), "k", "ord")
    assert(sink.apply(df(Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "x", 5L))), 0L))
    val s0 = sink.current().get.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq
    assert(s0 == Seq((1L, "b"), (2L, "x")))
    // batch 1: update k=1 with LOWER ord (loses), k=2 EQUAL ord (batch wins),
    // k=3 new
    assert(sink.apply(df(Seq((1L, "stale", 15L), (2L, "y", 5L), (3L, "n", 1L))), 1L))
    val s1 = sink.current().get.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq
    assert(s1 == Seq((1L, "b"), (2L, "y"), (3L, "n")))
  }

  test("replayed batchId is skipped — the view is exactly-once") {
    val sink = new UpsertSink(spark, tmpDir("upsert2"), "k", "ord")
    assert(sink.apply(df(Seq((1L, "a", 1L))), 0L))
    assert(!sink.apply(df(Seq((1L, "DOUBLE-APPLIED", 99L))), 0L))
    assert(sink.lastBatchId.contains(0L))
    val got = sink.current().get.collect().map(_.getString(1)).toSeq
    assert(got == Seq("a"))
  }

  test("a different queryId over the same view is NOT a replay: its " +
      "batch 0 merges instead of being dropped (checkpoint-reset safety)") {
    val base = tmpDir("upsert5")
    val q1 = new UpsertSink(spark, base, "k", "ord", queryId = "q1")
    assert(q1.apply(df(Seq((1L, "from-q1", 5L))), 7L))
    // a new query (fresh checkpoint) starts numbering at 0 again
    val q2 = new UpsertSink(spark, base, "k", "ord", queryId = "q2")
    assert(q2.apply(df(Seq((2L, "from-q2", 1L))), 0L),
      "new query's batch 0 must not be treated as a replay of q1's 7")
    val got = q2.current().get.orderBy("k").collect()
      .map(_.getString(1)).toSeq
    assert(got == Seq("from-q1", "from-q2"))
    // but q2's OWN replay of batch 0 is still skipped
    assert(!q2.apply(df(Seq((9L, "dup", 1L))), 0L))
  }

  test("asOf time travel: each committed version remains readable and " +
      "reflects exactly the batches applied up to it") {
    val sink = new UpsertSink(spark, tmpDir("upsert4"), "k", "ord")
    assert(sink.apply(df(Seq((1L, "v0", 1L))), 0L))
    assert(sink.apply(df(Seq((1L, "v1", 2L), (2L, "w", 1L))), 1L))
    val at0 = sink.asOf(0L).get.collect().map(_.getString(1)).toSeq
    assert(at0 == Seq("v0"))
    val at1 = sink.asOf(1L).get.orderBy("k").collect()
      .map(_.getString(1)).toSeq
    assert(at1 == Seq("v1", "w"))
    assert(sink.asOf(7L).isEmpty)
  }

  test("property: sequential batch merges equal one-shot latest-per-key " +
      "over the concatenated input (seeded random batch splits)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      // random rows: keys 1..6, distinct ord per row so the winner is
      // unambiguous regardless of batch boundaries
      val rows = rnd.shuffle((1 to 30).toList).map { i =>
        (1L + rnd.nextInt(6), s"v$i-t$trial", i.toLong)
      }
      val nBatches = 1 + rnd.nextInt(4)
      val batches = rows.grouped(math.max(1, rows.size / nBatches)).toSeq
      val sink = new UpsertSink(spark, tmpDir(s"upsertp$trial"), "k", "ord")
      batches.zipWithIndex.foreach { case (b, id) =>
        assert(sink.apply(df(b), id.toLong))
      }
      val got = sink.current().get.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = rows.groupBy(_._1).view.mapValues(_.maxBy(_._3)._2)
        .toSeq.map { case (k, v) => (k, v) }.sortBy(_._1)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("drives from a real streaming query: final view is latest per key") {
    val base = tmpDir("upsert3")
    val src = tmpDir("upsert3src")
    // two files → with maxFilesPerTrigger=1, two micro-batches
    df(Seq((1L, "b0-k1", 1L), (2L, "b0-k2", 1L)))
      .coalesce(1).write.parquet(s"$src/f0")
    df(Seq((1L, "b1-k1", 2L), (3L, "b1-k3", 1L)))
      .coalesce(1).write.parquet(s"$src/f1")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("ord", LongType)))
    val sink = new UpsertSink(spark, base, "k", "ord")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.apply(b, id): Unit
      }.start()
    try q.awaitTermination() finally q.stop()
    val fin = sink.current().get.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq
    assert(fin.map(_._1) == Seq(1L, 2L, 3L))
    assert(fin.find(_._1 == 1L).get._2 == "b1-k1")
  }
}
