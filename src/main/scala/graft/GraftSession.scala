package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder: the configuration an engine deployment uses,
  * local or cluster (SURVEY §4.2 knobs + the custom function extensions).
  *
  * Notable at scale: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized to cores (driver overrides per cluster), UTC
  * session time for oracle/cross-engine parity.
  *
  * `rocksdbStateStore = true` switches every stateful streaming operator
  * (windowed aggs, stream-stream joins, dropDuplicates, [flat]MapGroups
  * WithState) from the default in-heap HDFS-backed store to Spark's
  * embedded RocksDB provider with changelog checkpointing — state size
  * then bounds on local disk instead of executor heap, and a checkpoint
  * commit ships only the batch's delta, not a full snapshot. This is the
  * direct analogue of the reference's RocksDB-backed KStreams stores with
  * changelog topics (streams.clj:27 — its bounded-window-store guarantee);
  * at 100 TB-scale state (billions of join/session keys) the in-heap store
  * is not an option. Local default stays in-heap: tiny tests are faster
  * there and the provider is a per-deployment choice, not semantics.
  */
object GraftSession {
  def build(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      rocksdbStateStore: Boolean = false)
      : SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (rocksdbStateStore) rocksdbConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Spark's embedded RocksDB state store (spark-sql, no extra jars —
    * rocksdbjni ships with the distribution). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The exact conf set `rocksdbStateStore = true` applies — exposed so a
    * caller can apply it to an existing session (SQL confs are settable at
    * runtime and read per-query at stream start), which is also how
    * RocksDBStateSpec drives this path against the shared test session. */
  val rocksdbConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")
}
