package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dead-set management (E6, messaging/dead_set.clj:6-28 + HTTP
  * resource/dead_set.clj:46-94): view / replay / delete the first N dead
  * messages.
  *
  * A Kafka log can't delete records, so the imperative queue ops become a
  * committed-offset marker per entity (SURVEY §4.2 "custom, small"): the
  * live dead-set is every DLQ record with offset > marker.
  *   view N    → bounded batch read, no marker change (RMQ peek-no-ack)
  *   delete N  → advance the marker past the first N
  *   replay N  → append the first N to the instant topic, then advance
  * The marker is a tiny text file beside the topic dir (driver-side state,
  * like a checkpoint); all record reads are distributed Spark scans with the
  * offset predicate pushed to parquet/Kafka.
  */
final class DeadSet(topics: TopicIO, markerDir: String) {

  /** Per-entity lock serializing the marker read-modify-write in
    * [[delete]]/[[replay]]. Without it two concurrent replays of the same
    * N both read the old marker, both publish, and the dead messages are
    * processed twice. The reference has the same race — its HTTP replay
    * runs in an async future (resource/dead_set.clj:54,:87) with no
    * coordination; the management server's serial executor used to mask
    * it here, but correctness must not depend on the HTTP layer's
    * threading. */
  private val entityLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(entity: String): Object =
    entityLocks.computeIfAbsent(entity, _ => new Object)

  private def markerPath(entity: String) =
    Paths.get(s"$markerDir/${entity}_dlq_marker")

  def marker(entity: String): Long =
    if (Files.exists(markerPath(entity)))
      new String(Files.readAllBytes(markerPath(entity))).trim.toLong
    else -1L

  private def setMarker(entity: String, offset: Long): Unit = {
    Files.createDirectories(markerPath(entity).getParent)
    Files.write(markerPath(entity), offset.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  private def live(spark: SparkSession, entity: String): DataFrame =
    topics.read(spark, EngineConfig.deadLetterTopic(entity))
      .filter(col("offset") > marker(entity))
      .orderBy(col("offset"))

  /** Peek first `n` without acking (GET /v1/dead_set). */
  def view(spark: SparkSession, entity: String, n: Int): DataFrame =
    live(spark, entity).limit(n)

  /** Drop first `n` (DELETE /v1/dead_set): advance the marker only. */
  def delete(spark: SparkSession, entity: String, n: Int): Long =
    lockFor(entity).synchronized {
      val offsets = view(spark, entity, n).select("offset").collect()
      if (offsets.nonEmpty) {
        setMarker(entity, offsets.map(_.getLong(0)).max)
      }
      offsets.length.toLong
    }

  /** Re-publish first `n` to the entity's instant topic for reprocessing,
    * then ack them (POST /v1/dead_set/replay). Replayed records carry a
    * reset retryCount (the DLQ writer restored it — RetryEngine). */
  def replay(spark: SparkSession, entity: String, n: Int): Long =
    lockFor(entity).synchronized {
      val batch = view(spark, entity, n).cache()
      try {
        val offsets = batch.select("offset").collect()
        if (offsets.nonEmpty) {
          topics.append(batch.withColumn("nextAttemptAt",
            lit(null).cast("timestamp")), EngineConfig.instantTopic(entity))
          setMarker(entity, offsets.map(_.getLong(0)).max)
        }
        offsets.length.toLong
      } finally batch.unpersist()
    }
}
