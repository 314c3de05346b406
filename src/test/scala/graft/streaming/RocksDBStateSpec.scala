package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RocksDB state store parity (reference anchor: streams.clj:27 — KStreams
  * window stores are RocksDB-backed with changelog topics; our equivalent
  * is Spark's embedded RocksDB provider + changelog checkpointing, wired
  * via GraftSession.build(rocksdbStateStore = true)).
  *
  * The provider must be a pure deployment choice: identical results to the
  * default in-heap store, with state held on local disk. This spec runs a
  * stateful streaming aggregation with the provider set per-query (the
  * session conf is read at query start), asserts the result equals the
  * batch twin, and proves RocksDB actually engaged by reading the rocksdb*
  * custom metrics from the query's state operator progress.
  */
class RocksDBStateSpec extends SparkSuite {

  /** Apply GraftSession's RocksDB conf set to the shared session, run
    * `body`, restore. Exercises the same pairs build() applies. */
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

  test("windowed agg on the RocksDB provider equals the batch result and " +
      "reports rocksdb state-store metrics") {
    withRocksdb {
      val dir = tmpDir("rocksdb-events")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val scanned = spark.read.parquet(dir).schema
      val streamed = spark.readStream.schema(scanned).parquet(dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("window_start_ms"),
          col("event_type"), col("n"))
      val name = s"rocks_${System.nanoTime()}"
      val q = streamed.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table(name)
          .orderBy("window_start_ms", "event_type")
          .collect().map(_.toSeq).toSeq
        val want = graft.Tables(spark, sf0001).events
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("w.start")).as("window_start_ms"),
            col("event_type"), col("n"))
          .orderBy("window_start_ms", "event_type")
          .collect().map(_.toSeq).toSeq
        assert(got == want)
        // the provider really was RocksDB: its state operator publishes
        // rocksdb-prefixed custom metrics the in-heap store doesn't have
        val ops = q.lastProgress.stateOperators
        assert(ops.nonEmpty)
        val metricKeys = ops.flatMap(_.customMetrics.keySet.toArray).toSet
        assert(metricKeys.exists(_.toString.startsWith("rocksdb")),
          s"no rocksdb metrics in $metricKeys")
        assert(ops.map(_.numRowsTotal).sum > 0)
      } finally q.stop()
    }
  }

  test("stateful dedup on RocksDB drops the duplicated file exactly") {
    withRocksdb {
      val dir = tmpDir("rocksdb-dedup")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events2.parquet"))
      val scanned = spark.read.parquet(dir).schema
      val deduped = spark.readStream.schema(scanned).parquet(dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id", "ts")
      val name = s"rocksdd_${System.nanoTime()}"
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table(name).count() ==
          graft.Tables(spark, sf0001).events.count())
      } finally q.stop()
    }
  }
}
