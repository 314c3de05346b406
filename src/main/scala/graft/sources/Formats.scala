package graft.sources

import graft.streaming.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch source/sink formats beyond the Kafka/parquet transports: CSV and
  * JSON-lines with explicit schemas (schema-on-read discipline — never
  * inferSchema in production paths; at 100 TB an inference pass is a full
  * extra scan).
  *
  * Envelope interchange: binary columns (key/value) don't survive CSV/JSON
  * natively, so export base64-encodes them and import decodes — the
  * standard dump/restore path for topic logs.
  */
object Formats {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Envelope topic log → portable JSON-lines dump (binary → base64). */
  /** Bucketed managed-table write — the co-located-join lever at 100 TB:
    * two tables bucketed by the same key into the same bucket count join
    * with ZERO exchanges (each bucket pair joins in place; BucketingSpec
    * pins the shuffle-free plan). The same layout makes repeated
    * aggregations on the bucket key shuffle-free. Bucket count is a
    * layout-time commitment — pick it for the JOINED size at target scale
    * (buckets ≈ data size / 128 MB), since both sides must match. `sortBy`
    * pre-sorts within buckets so sort-merge join skips its sort step. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Hive-style partitioned write — the partition-pruning lever: a query
    * filtering on the partition column reads ONLY the matching
    * directories (pruning happens at planning, before any file is
    * opened — FormatsSpec pins `PartitionFilters` in the scan and the
    * pruned file count). Partition by low-cardinality routing columns a
    * 100 TB pipeline filters on constantly (ingest date, language,
    * source); high-cardinality keys belong in bucketing, not partitions
    * (a million tiny directories is a metastore DoS, not a layout). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def exportEnvelopes(env: DataFrame, path: String): Unit =
    env
      .withColumn("key", base64(col("key")))
      .withColumn("value", base64(col("value")))
      .write.mode("overwrite").json(path)

  /** Portable dump → envelope rows (base64 → binary). */
  def importEnvelopes(spark: SparkSession, path: String): DataFrame = {
    val textual = StructType(Envelope.schema.map {
      case f if f.name == "key" || f.name == "value" =>
        f.copy(dataType = org.apache.spark.sql.types.StringType)
      case f => f
    })
    spark.read.schema(textual).json(path)
      .withColumn("key", unbase64(col("key")))
      .withColumn("value", unbase64(col("value")))
      .select(Envelope.schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
