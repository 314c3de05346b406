package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pipeline: opaque binary media + typed metadata, with
  * partition-wise batch decode — the Spark plumbing a real image/audio
  * pipeline needs (schema, partitioning, batch shape), with the actual
  * codec behind a STUB (no media libs ship in this container).
  *
  * Production swap-in: replace [[StubDecoder.decode]] with the real decoder
  * (JNI/javacpp ffmpeg, ImageIO, etc.); everything else — the mapPartitions
  * batching, the struct schema, the error row channel — is unchanged. At
  * 100 TB, `media` tables should be stored with the binary column last
  * (parquet reads prefix columns cheaply for metadata-only queries) and
  * repartitioned by size so one task holds a bounded number of blobs.
  */
object MediaPipeline {

  final case class MediaRecord(media_id: Long, kind: String,
      blob: Array[Byte], mime: String)

  final case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean, error: String)

  /** STUB decoder — deterministic fake features derived from the bytes.
    * The real implementation parses the container format; this keeps the
    * exact signature and batch contract. */
  object StubDecoder {
    def decode(r: MediaRecord): DecodedMedia =
      if (r.blob == null || r.blob.isEmpty)
        DecodedMedia(r.media_id, r.kind, 0, 0, 0, 0, ok = false, "empty blob")
      else {
        val n = r.blob.length
        DecodedMedia(r.media_id, r.kind, n.toLong,
          width = n % 640, height = (n * 7) % 480,
          n_frames = if (r.kind == "video") 1 + n % 30 else 1,
          ok = true, error = null)
      }
  }

  /** Partition-wise decode: one decoder instance per partition (the
    * expensive init — codec contexts, model weights — amortizes across the
    * partition's rows, the same reason PySpark uses mapInPandas batches). */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close on iterator exhaustion
      rows.map(StubDecoder.decode)
    }
  }

  /** Frame sampling plan for video blobs: every `stride`-th frame index up
    * to n_frames — pure column math over the decoded metadata, so the frame
    * extraction stage receives (media_id, frame_idx) work units it can
    * repartition freely. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("ok") && col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))
}
