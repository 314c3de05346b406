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
