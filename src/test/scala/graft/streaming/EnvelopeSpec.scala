package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Envelope schema contract: which columns a producer may omit. */
class EnvelopeSpec extends SparkSuite {

  test("withOptionalColumns adds ONLY the retry-extension fields; a frame " +
      "missing a Kafka-source column is left incomplete (fails fast at " +
      "append, no silent typed-null value/key)") {
    val sess = spark
    import sess.implicits._
    val full = Seq(("k", "v")).toDF("k", "v").select(
      col("k").cast("binary").as("key"),
      col("v").cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
      current_timestamp().as("timestamp"), lit("e").as("topicEntity"))
    val widened = Envelope.withOptionalColumns(full)
    assert(widened.columns.toSet ==
      Set("key", "value", "topic", "partition", "offset", "timestamp",
        "topicEntity", "retryCount", "nextAttemptAt", "channel", "headers"))

    // drop `value`: the optional-column pass must NOT paper over it
    val missingValue = full.drop("value")
    assert(!Envelope.withOptionalColumns(missingValue)
      .columns.contains("value"),
      "a missing Kafka-source column must stay missing")
  }
}
