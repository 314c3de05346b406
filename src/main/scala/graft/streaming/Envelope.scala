package graft.streaming

import org.apache.spark.sql.types._

/** The record envelope — the engine's unit of data, mirroring the Kafka
  * source schema plus the retry-envelope extension (SURVEY.md §1.2; reference
  * message_payload.clj:4, header_transformer.clj:9-14,
  * messaging/producer.clj:288-293).
  *
  * On a real cluster this is exactly what `spark.readStream.format("kafka")`
  * yields; the retry fields are added by the dispatcher when a record is
  * published to a retry/DLQ topic.
  */
final case class Envelope(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    topicEntity: String,
    retryCount: Option[Int] = None,
    nextAttemptAt: Option[java.sql.Timestamp] = None,
    channel: Option[String] = None)

object Envelope {
  /** Kafka-source-compatible schema (FIXTURES.md §1). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("topicEntity", StringType),
    StructField("retryCount", IntegerType, nullable = true),
    StructField("nextAttemptAt", TimestampType, nullable = true),
    StructField("channel", StringType, nullable = true)))

  /** Result codes a handler may return per record — mapper.clj:55-65.
    * (`:block` is unimplemented in the reference, mapper.clj:62 — out of
    * scope per SURVEY §7.3.) */
  object Code {
    val Success = "success"
    val Skip = "skip"
    val Retry = "retry"
    val DeadLetter = "dead_letter"
    /** channel fan-out is encoded as `channel:<name>` */
    def channel(name: String): String = s"channel:$name"
    val terminal: Set[String] = Set(Success, Skip, Retry, DeadLetter)
  }
}
