package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded-state proof for the long-running stateful streams: drives
  * joinChain (J4) and dedupWithinWatermark over many micro-batches with
  * steadily advancing event time and asserts, via
  * StreamingQueryProgress.stateOperators, that state-store row counts
  * PLATEAU once the watermark starts passing — the Structured Streaming
  * equivalent of the reference's bounded RocksDB window stores
  * (streams.clj:27,149). Without eviction both queries' state would grow
  * linearly with the batch count; the assertions fail in that world.
  *
  * Each scenario runs TWICE: on the default in-heap provider and on the
  * RocksDB provider (GraftSession.rocksdbConfs — the production
  * configuration matching the reference's RocksDB stores), asserting the
  * SAME plateau and that RocksDB really engaged (rocksdb* custom
  * metrics). Eviction is a property of the watermark contract, not of
  * the store — this pins that it holds on the deployment-grade store. */
class StreamStateBoundsSpec extends SparkSuite {

  private val t0 = ts("2024-01-01 00:00:00").getTime

  /** Per-progress total state rows across all stateful operators. */
  private def stateSeries(q: StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)

  /** The plateau assertion: state peaked by the middle third of the run
    * and never exceeded that peak afterwards (no growth trend), and the
    * final footprint is far below the unbounded-accumulation line. */
  private def assertPlateau(series: Seq[Long], totalIngested: Long,
      label: String): Unit = {
    assert(series.size >= 12, s"$label: too few progress points ($series)")
    val third = series.size / 3
    val midPeak = series.slice(third, 2 * third).max
    val latePeak = series.drop(2 * third).max
    assert(latePeak <= midPeak,
      s"$label: state still growing after watermark eviction should have " +
        s"kicked in — mid-run peak $midPeak, late peak $latePeak; $series")
    assert(series.last < totalIngested / 2,
      s"$label: final state ${series.last} is not far below the " +
        s"unbounded line ($totalIngested rows ingested); $series")
  }

  /** Apply GraftSession's RocksDB conf set, run `body`, restore —
    * the same pairs GraftSession.build(rocksdbStateStore = true) sets. */
  private def withRocksdb[A](body: => A): A = {
    val prior = graft.GraftSession.rocksdbConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    graft.GraftSession.rocksdbConfs.foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** RocksDB engagement proof: rocksdb-prefixed custom state metrics. */
  private def assertRocksdbEngaged(q: StreamingQuery): Unit = {
    val keys = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.toArray).toSet
    assert(keys.exists(_.toString.startsWith("rocksdb")),
      s"expected rocksdb custom metrics, saw $keys")
  }

  private def driveJoinChain(label: String,
      check: StreamingQuery => Unit = _ => ()): Unit = {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val s1 = MemoryStream[PlateauEv]; val s2 = MemoryStream[PlateauEv]; val s3 = MemoryStream[PlateauEv]
    val chained = StreamJoins.joinChain(
      Seq(s1.toDF(), s2.toDF(), s3.toDF()), "k", "ts",
      Seq((5000L, "inner"), (5000L, "inner")))
    val q = chained.writeStream.format("noop").outputMode("append").start()
    val batches = 24
    val perBatch = 40
    try {
      for (b <- 0 until batches) {
        // event time advances 60 s per batch; join window 5 s, watermark
        // delay 10 s → each batch's state is evictable by the next batch
        val rows = (0 until perBatch).map { i =>
          PlateauEv(s"k$b-$i", new java.sql.Timestamp(t0 + b * 60000L + i), s"v$i")
        }
        s1.addData(rows); s2.addData(rows); s3.addData(rows)
        q.processAllAvailable()
      }
      val series = stateSeries(q)
      assertPlateau(series, batches.toLong * perBatch * 3, label)
      check(q)
    } finally q.stop()
  }

  private def driveDedup(label: String,
      check: StreamingQuery => Unit = _ => ()): Unit = {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val src = MemoryStream[PlateauEv]
    val deduped = Pipeline.dedupWithinWatermark(
      Seq("k"), "ts", horizon = "10 seconds")(src.toDF())
    val q = deduped.writeStream.format("noop").outputMode("append").start()
    val batches = 24
    val perBatch = 40
    try {
      for (b <- 0 until batches) {
        val rows = (0 until perBatch).flatMap { i =>
          val e = PlateauEv(s"k$b-$i", new java.sql.Timestamp(t0 + b * 60000L + i), "v")
          Seq(e, e) // a within-batch duplicate keeps the operator honest
        }
        src.addData(rows)
        q.processAllAvailable()
      }
      val series = stateSeries(q)
      assertPlateau(series, batches.toLong * perBatch, label)
      check(q)
    } finally q.stop()
  }

  test("joinChain state plateaus under watermark over a long horizon (J4)") {
    driveJoinChain("joinChain")
  }

  test("dedupWithinWatermark state plateaus over a long horizon") {
    driveDedup("dedupWithinWatermark")
  }

  test("joinChain state plateaus on the ROCKSDB store over the same long " +
      "horizon (the reference's RocksDB window-store configuration)") {
    withRocksdb {
      driveJoinChain("joinChain/rocksdb", assertRocksdbEngaged)
    }
  }

  test("dedupWithinWatermark state plateaus on the ROCKSDB store") {
    withRocksdb {
      driveDedup("dedupWithinWatermark/rocksdb", assertRocksdbEngaged)
    }
  }
}

/** Top level, not nested in the suite: a nested case class's encoder
  * closes over the suite instance, which breaks expression codegen
  * ("Expr codegen error" → interpreted fallback) — the plateau scenarios
  * would then certify the interpreted state path instead of the
  * codegen'd one the engine runs in production. */
case class PlateauEv(k: String, ts: java.sql.Timestamp, v: String)
