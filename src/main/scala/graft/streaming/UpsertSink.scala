package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
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
  * Replay-idempotence: the pointer file records the last applied
  * (queryId, batchId) token — the same discipline the topic sinks use
  * (TopicIO.append's `<query>-<batchId>`), applied to state instead of a
  * log. A replayed micro-batch (same query, same id) is skipped, so
  * Structured Streaming's at-least-once `foreachBatch` contract yields an
  * exactly-once VIEW; a DIFFERENT queryId (new query over the same view, or
  * a checkpoint reset that restarts batch numbering at 0) is NOT a replay
  * and merges normally.
  *
  * All pointer I/O goes through the Hadoop filesystem of `baseDir`'s
  * scheme, so the same code runs against file:, hdfs:, or s3a: state dirs
  * (the parquet versions already do). The pointer flip uses
  * FileContext.rename(OVERWRITE) — atomic on HDFS and local; on object
  * stores the rename is copy+delete of a ~40-byte file, and a crash in the
  * window leaves the OLD pointer intact (never a half-written one, since
  * the temp is fully written first).
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
    keyCol: String, orderCol: String, queryId: String = "default") {

  private val ptrPath = new Path(s"$baseDir/CURRENT")
  private def fs = ptrPath.getFileSystem(
    spark.sessionState.newHadoopConf())

  /** (version dir, queryId, batchId) from the pointer, if committed. */
  private def currentMeta(): Option[(String, String, Long)] = {
    val f = fs
    if (!f.exists(ptrPath)) None
    else {
      val in = f.open(ptrPath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      s.split(",") match {
        case Array(dir, qid, bid) => Some((dir, qid, bid.toLong))
        case Array(dir, bid) => Some((dir, queryId, bid.toLong)) // legacy
        case _ => None
      }
    }
  }

  /** The current materialized state, if any batch has committed. */
  def current(): Option[DataFrame] =
    currentMeta().map { case (dir, _, _) =>
      spark.read.parquet(s"$baseDir/$dir")
    }

  def lastBatchId: Option[Long] = currentMeta().map(_._3)

  /** Time travel: the materialized state as of `batchId` (the version that
    * batch committed). Version directories are retained on write — the
    * library's retention policy is "keep everything, caller prunes"; a
    * production deployment vacuums old versions the way table formats do. */
  def asOf(batchId: Long): Option[DataFrame] = {
    val dir = new Path(s"$baseDir/v$batchId")
    if (fs.exists(dir)) Some(spark.read.parquet(dir.toString)) else None
  }

  /** Merge one micro-batch into the view. Returns false when the batch was
    * already applied BY THIS QUERY (replay) and was skipped. */
  def apply(batch: DataFrame, batchId: Long): Boolean = {
    val replay = currentMeta().exists { case (_, qid, bid) =>
      qid == queryId && batchId <= bid
    }
    if (replay) return false
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
    val f = fs
    val tmp = new Path(s"$baseDir/CURRENT.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$next,$queryId,$batchId".getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(ptrPath.toUri,
      spark.sessionState.newHadoopConf())
      .rename(tmp, ptrPath, Options.Rename.OVERWRITE)
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
