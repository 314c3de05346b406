package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder: the configuration an engine deployment uses,
  * local or cluster (SURVEY §4.2 knobs + the custom function extensions).
  *
  * Notable at scale: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized to cores (driver overrides per cluster), UTC
  * session time for oracle/cross-engine parity.
  */
object GraftSession {
  def build(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
