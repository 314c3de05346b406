package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Topic transport abstraction. Production transport is Kafka (the
  * reference's only source, SURVEY §2.1); tests and this container (no
  * kafka-sql jar ships with the image) use a parquet-directory transport
  * with the same envelope schema and append-only, offset-ordered semantics.
  */
trait TopicIO extends Serializable {
  /** Batch-read the full topic as envelope rows. */
  def read(spark: SparkSession, topic: String): DataFrame
  /** Streaming read (Structured Streaming source). */
  def readStream(spark: SparkSession, topic: String): DataFrame =
    readStream(spark, topic, Map.empty)
  /** Streaming read with source options (throttling etc.). */
  def readStream(spark: SparkSession, topic: String,
      options: Map[String, String]): DataFrame
  /** Transport-appropriate per-trigger throttle for a polled batch route
    * (S3 max-poll-records): Kafka → maxOffsetsPerTrigger; file transport →
    * maxFilesPerTrigger (file granularity is the closest analogue). */
  def paceOptions(maxPollRecords: Int): Map[String, String] = Map.empty
  /** Append envelope rows. Must assign monotonically increasing offsets. */
  def append(df: DataFrame, topic: String): Unit
  /** Largest offset written so far, -1 if empty. */
  def maxOffset(spark: SparkSession, topic: String): Long
  /** K4 topology provisioning (messaging/producer.clj:302-378 → Kafka
    * AdminClient.createTopics): ensure the retry/DLQ/instant/channel topics
    * for an entity exist before queries start. */
  def provision(entity: String, channels: Iterable[String]): Unit = ()

  /** Idempotent append keyed by a replay token (SURVEY §7.3.1: foreachBatch
    * may replay a micro-batch after failure; sink writes must not double-
    * publish). The token is `<query>-<batchId>`; an append with an
    * already-applied token is a no-op. Kafka transport gets this from the
    * sink's transactional/idempotent producer; the file transport records
    * applied tokens. Default: non-idempotent passthrough. */
  def appendIdempotent(df: DataFrame, topic: String, token: String): Unit =
    append(df, topic)
}

/** Kafka transport: thin option-builders over the built-in kafka source/sink
  * (format("kafka")). Compiles without the connector jar — it is resolved by
  * name at runtime — so this container can't execute it; FileTopicIO is the
  * test transport. On a cluster:
  * readStream.format("kafka").option("subscribePattern", topic) mirrors the
  * regex subscription of streams.clj:184, and checkpointed offsets replace
  * per-message acks (SURVEY §2.1 S1/S4).
  */
final class KafkaTopicIO(bootstrapServers: String,
    security: SecurityConfig = SecurityConfig()) extends TopicIO {
  private def opts(r: org.apache.spark.sql.DataFrameReader, topic: String) = r
    .format("kafka")
    .option("kafka.bootstrap.servers", bootstrapServers)
    .option("subscribePattern", topic)
    .option("startingOffsets", "earliest")
    .option("includeHeaders", "true")
    .options(security.kafkaOptions)

  def read(spark: SparkSession, topic: String): DataFrame =
    normalize(opts(spark.read, topic).load(), topic)

  def readStream(spark: SparkSession, topic: String,
      options: Map[String, String]): DataFrame =
    normalize(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribePattern", topic)
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
      .options(security.kafkaOptions)
      .options(options)
      .load(), topic)

  override def paceOptions(maxPollRecords: Int): Map[String, String] =
    Map("maxOffsetsPerTrigger" -> maxPollRecords.toString)

  /** Kafka source columns → Envelope columns (record headers are carried
    * verbatim; retry fields are carried in the value for the Kafka
    * transport). */
  private def normalize(df: DataFrame, topicEntity: String): DataFrame = df
    .select(col("key"), col("value"), col("topic"), col("partition"),
      col("offset"), col("timestamp"),
      lit(topicEntity).as("topicEntity"),
      lit(null).cast("int").as("retryCount"),
      lit(null).cast("timestamp").as("nextAttemptAt"),
      lit(null).cast("string").as("channel"),
      col("headers"))

  /** The Kafka sink writes the optional `headers` column as record headers —
    * the AMQP-property copy of messaging/producer.clj:53-57, so headers
    * survive every retry/DLQ/channel hop. */
  def append(df: DataFrame, topic: String): Unit = {
    val cols = Seq(col("key"), col("value")) ++
      (if (df.columns.contains("headers")) Seq(col("headers")) else Nil)
    // the sink picks the optional `headers` column up by name — no option
    df.select(cols: _*)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .options(security.kafkaOptions)
      .option("topic", topic)
      .save()
  }

  def maxOffset(spark: SparkSession, topic: String): Long =
    read(spark, topic).agg(max("offset")).collect()(0) match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
}

/** Parquet-directory transport with envelope schema, used by every spec and
  * by the in-container engine. Offsets are assigned on append as
  * (previous max + zipWithIndex-style row_number), giving the same
  * append-only, offset-ordered log semantics the dead-set marker logic
  * (DeadSet.scala) relies on.
  */
final class FileTopicIO(baseDir: String) extends TopicIO {
  private def dir(topic: String) = s"$baseDir/$topic"

  private def exists(topic: String): Boolean = {
    val p = Paths.get(dir(topic))
    Files.exists(p) && Files.list(p).anyMatch(f =>
      f.toString.endsWith(".parquet"))
  }

  def read(spark: SparkSession, topic: String): DataFrame =
    if (exists(topic)) spark.read.schema(Envelope.schema).parquet(dir(topic))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Envelope.schema)

  def readStream(spark: SparkSession, topic: String,
      options: Map[String, String]): DataFrame = {
    Files.createDirectories(Paths.get(dir(topic)))
    spark.readStream.schema(Envelope.schema).options(options)
      .parquet(dir(topic))
  }

  override def paceOptions(maxPollRecords: Int): Map[String, String] =
    Map("maxFilesPerTrigger" -> "1")

  def append(df: DataFrame, topic: String): Unit = {
    val spark = df.sparkSession
    val base = maxOffset(spark, topic) + 1
    // Contiguous offsets without a single-partition global window:
    // zipWithIndex computes per-partition counts in one lightweight job,
    // then every partition stamps its contiguous id range in parallel —
    // the multi-partition analogue of a log append. (This is the test/
    // emulation transport; the Kafka sink lets the broker assign offsets.)
    val fields = Envelope.schema.fieldNames.toIndexedSeq
    val offsetIdx = fields.indexOf("offset")
    val indexed = Envelope.withOptionalColumns(df)
      .select(fields.map(col): _*).rdd.zipWithIndex.map {
      case (r, i) => org.apache.spark.sql.Row.fromSeq(
        r.toSeq.updated(offsetIdx, base + i))
    }
    spark.createDataFrame(indexed, Envelope.schema)
      .write.mode("append").parquet(dir(topic))
  }

  def maxOffset(spark: SparkSession, topic: String): Long =
    if (!exists(topic)) -1L
    else read(spark, topic).agg(max("offset")).collect()(0) match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }

  override def provision(entity: String, channels: Iterable[String]): Unit = {
    val topics = Seq(EngineConfig.instantTopic(entity),
      EngineConfig.retryTopic(entity), EngineConfig.deadLetterTopic(entity)) ++
      channels.map(EngineConfig.channelTopic(entity, _))
    topics.foreach(t => Files.createDirectories(Paths.get(dir(t))))
  }

  override def appendIdempotent(df: DataFrame, topic: String,
      token: String): Unit = {
    val marker = Paths.get(s"${dir(topic)}/_applied-$token")
    if (!Files.exists(marker)) {
      append(df, topic)
      Files.createDirectories(marker.getParent)
      Files.createFile(marker)
    }
  }
}
