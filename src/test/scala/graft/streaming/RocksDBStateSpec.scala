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

  test("streamingAsOf's versioned three-field state restores across a " +
      "checkpointed restart on the RocksDB provider — the ref written " +
      "before the stop serves probes after it (heap restore is " +
      "AsOfStreamSpec's; this closes the provider matrix)") {
    withRocksdb {
      import org.apache.spark.sql.Row
      val ckpt = tmpDir("rocks-asof-ckpt")
      val inDir = tmpDir("rocks-asof-in")
      val schema =
        "key LONG, ts TIMESTAMP, side STRING, value DOUBLE, event_id LONG"
      def feed(name: String, lines: String*): Unit = {
        // write-then-ATOMIC_MOVE: a direct write races the source's
        // directory listing (see AsOfStreamSpec)
        val tmp = java.nio.file.Files.createTempFile("rocks_asof_", ".json")
        java.nio.file.Files.write(tmp, lines.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(inDir, name),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
      def start() = Pipeline.streamingAsOf()(
          spark.readStream.schema(schema).json(inDir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(got.add)
        }.start()
      def await(nRows: Int): Unit = {
        // poll with a deadline: processAllAvailable hangs under
        // ProcessingTimeTimeout's timer batches (the suite gotcha)
        val deadline = System.currentTimeMillis + 60000
        while (got.size < nRows
            && System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(got.size >= nRows, s"timed out waiting for $nRows rows")
      }
      val q1 = start()
      try {
        feed("b1.json",
          """{"key":7,"ts":"2026-01-01 10:00:00","side":"ref",""" +
            """"value":3.25,"event_id":5}""",
          """{"key":7,"ts":"2026-01-01 10:00:30","side":"probe",""" +
            """"value":1.0,"event_id":6}""")
        await(1)
        // the provider really was RocksDB, not a silently-defaulted heap
        // (progress reporting lags foreachBatch — poll, don't read once)
        val progressDeadline = System.currentTimeMillis + 60000
        while (q1.lastProgress == null
            && System.currentTimeMillis < progressDeadline) Thread.sleep(200)
        assert(q1.lastProgress != null, "no progress report within 60s")
        val metricKeys = q1.lastProgress.stateOperators
          .flatMap(_.customMetrics.keySet.toArray).toSet
        assert(metricKeys.exists(_.toString.startsWith("rocksdb")),
          s"no rocksdb metrics in $metricKeys")
      } finally q1.stop()
      // restart from the checkpoint: the ref exists only in RocksDB state
      val q2 = start()
      try {
        feed("b2.json",
          """{"key":7,"ts":"2026-01-01 10:05:00","side":"probe",""" +
            """"value":2.0,"event_id":8}""")
        await(2)
        val post = got.toArray(Array.empty[Row])
          .filter(_.getDouble(2) == 2.0)
        assert(post.length == 1,
          s"post-restart probe missing (${post.length})")
        assert(!post(0).isNullAt(3) && post(0).getDouble(3) == 3.25,
          s"restored three-field state must serve the probe: ${post(0)}")
      } finally q2.stop()
    }
  }

  test("timer-driven funnel (flatMapGroupsWithState + ProcessingTime " +
      "timeout) on the RocksDB provider: stages advance, rocksdb metrics " +
      "present, and the TTL timer evicts idle users — the timer path is " +
      "a distinct state-store surface from aggs/joins/dedup") {
    withRocksdb {
      val sess = spark
      import sess.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[FunEv]
      val out = Pipeline.streamingFunnel(Seq("view", "click"),
        stateTtl = Some("2 seconds"))(in.toDF())
      val name = s"rocks_funnel_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(
          FunEv(1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
            "view"),
          FunEv(1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:05"),
            "click"),
          FunEv(2L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
            "view"))
        // timer-driven query: poll the sink with a deadline, never
        // processAllAvailable (it never settles on timeout batches)
        var deadline = System.currentTimeMillis + 60000
        while (spark.table(name).count() < 3
            && System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(spark.table(name).count() == 3,
          "view+click for user 1, view for user 2")
        def progress = Option(q.lastProgress)
          .filter(_.stateOperators.nonEmpty)
        deadline = System.currentTimeMillis + 60000
        while (progress.isEmpty
            && System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(progress.nonEmpty,
          "no state-operator progress within 60s — the funnel query " +
            "never completed a stateful batch")
        val metricKeys = progress.get.stateOperators
          .flatMap(_.customMetrics.keySet.toArray).toSet
        assert(metricKeys.exists(_.toString.startsWith("rocksdb")),
          s"no rocksdb metrics in $metricKeys")
        // TTL eviction drives the timer path against RocksDB state.
        // progress is non-empty past the assert above, so a later
        // timeout reads the true row count — not a MaxValue sentinel
        // that would mislabel the failure as "rows never evicted"
        def stateRows: Long =
          progress.get.stateOperators.map(_.numRowsTotal).sum
        deadline = System.currentTimeMillis + 60000
        while (stateRows != 0L
            && System.currentTimeMillis < deadline) Thread.sleep(500)
        assert(stateRows == 0L, "TTL must evict idle users on RocksDB")
        assert(spark.table(name).count() == 3, "emitted rows stand")
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
