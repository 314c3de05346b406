package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Materialized latest-state view maintained from `foreachBatch` — the
  * upsert ("MERGE INTO current-state table") sink the topic-append
  * transports don't provide: a streaming route whose serving output is
  * "current value per key", not a log.
  *
  * Semantics per micro-batch: within the batch, the row with the highest
  * (orderCol, then any deterministic tiebreak already in orderCol) wins per
  * key; the batch winners are merged into the standing state (batch beats
  * state at equal orderCol — last write wins); the merged state replaces
  * the view atomically (write new version directory, then flip a pointer
  * file — readers resolve the pointer, so a crash mid-write never exposes a
  * half-written view).
  *
  * Replay-idempotence: the pointer file records the last applied batchId;
  * a replayed micro-batch (same id) is skipped, so Structured Streaming's
  * at-least-once `foreachBatch` contract yields an exactly-once VIEW — the
  * same (query, batchId) token discipline the topic sinks use
  * (TopicIO.append), applied to state instead of a log.
  *
  * Scale: the merge is one keyed window over state ∪ batch — shuffle cost
  * ∝ state size, the standard cost of a full-compaction upsert view; at
  * 100 TB the same code runs against a partitioned state dir so only
  * partitions containing batch keys rewrite (partition-pruned union), and
  * the atomic-pointer discipline is what Delta/Iceberg commit logs do in
  * library form. Reference anchor: ziggurat has no state sink at all
  * (handlers push to downstream topics/queues, SURVEY §2.2) — this is
  * north-star extension surface.
  */
final class UpsertSink(spark: SparkSession, baseDir: String,
    keyCol: String, orderCol: String) {

  private val ptr = java.nio.file.Paths.get(s"$baseDir/CURRENT")

  private def currentMeta(): Option[(String, Long)] =
    if (java.nio.file.Files.exists(ptr)) {
      val s = new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8").trim
      val Array(dir, bid) = s.split(",")
      Some((dir, bid.toLong))
    } else None

  /** The current materialized state (empty schema-less read if nothing has
    * been committed yet — callers get an empty frame via the batch's own
    * schema in [[apply]]; external readers should check [[isEmpty]]). */
  def current(): Option[DataFrame] =
    currentMeta().map { case (dir, _) => spark.read.parquet(s"$baseDir/$dir") }

  def lastBatchId: Option[Long] = currentMeta().map(_._2)

  /** Time travel: the materialized state as of `batchId` (the version that
    * batch committed). Version directories are retained on write — the
    * library's retention policy is "keep everything, caller prunes"; a
    * production deployment vacuums old versions the way table formats do. */
  def asOf(batchId: Long): Option[DataFrame] = {
    val dir = java.nio.file.Paths.get(s"$baseDir/v$batchId")
    if (java.nio.file.Files.exists(dir))
      Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Merge one micro-batch into the view. Returns false when the batch was
    * already applied (replay) and was skipped. */
  def apply(batch: DataFrame, batchId: Long): Boolean = {
    if (lastBatchId.exists(batchId <= _)) return false
    val merged = current() match {
      case None => latestPerKey(batch)
      case Some(state) =>
        // state rows order below batch rows at equal orderCol: last write wins
        latestPerKey(state.withColumn("__src", lit(0))
          .unionByName(batch.withColumn("__src", lit(1))))
          .drop("__src")
    }
    val next = s"v$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/$next")
    val tmp = java.nio.file.Paths.get(s"$baseDir/CURRENT.tmp")
    java.nio.file.Files.write(tmp, s"$next,$batchId".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, ptr,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }

  private def latestPerKey(df: DataFrame): DataFrame = {
    val ordCols =
      if (df.columns.contains("__src"))
        Seq(col(orderCol).desc, col("__src").desc)
      else Seq(col(orderCol).desc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
