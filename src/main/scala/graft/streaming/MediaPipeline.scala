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
    * partition's rows, the same reason PySpark uses mapInPandas batches).
    * The decoder is the SLOT: default is the stub; [[PpmDecoder.decode]]
    * is a real, dependency-free codec proving the slot carries genuine
    * pixel decoding with no topology change (MediaDecodeSpec). */
  def decodeAll(media: Dataset[MediaRecord],
      decoder: MediaRecord => DecodedMedia = StubDecoder.decode)
      : Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close on iterator exhaustion
      rows.map(decoder)
    }
  }

  /** REAL decoder for binary PPM (P6) — a complete image codec in pure
    * byte math, no library: ASCII header (`P6`, optional `#` comments,
    * width, height, maxval ≤ 255, one whitespace) followed by
    * width×height packed RGB bytes. Exists to prove the decoder slot
    * end-to-end: same signature and error-row channel as the stub, but
    * width/height/pixels come from actually parsing the container. */
  object PpmDecoder {

    /** Parse a P6 blob → (width, height, RGB bytes), or an error. */
    def parse(blob: Array[Byte]): Either[String, (Int, Int, Array[Byte])] = {
      if (blob == null || blob.length < 2) return Left("empty blob")
      if (blob(0) != 'P' || blob(1) != '6') return Left("not a P6 ppm")
      var i = 2
      def skipSpace(): Unit = {
        var in = true
        while (in && i < blob.length) {
          val c = blob(i)
          if (c == '#') { while (i < blob.length && blob(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
          else in = false
        }
      }
      def readInt(): Int = {
        skipSpace()
        // accumulate in Long and clamp: a 10+-digit header number wraps
        // Int silently (12884901889 ≡ 1 mod 2^32 → bogus ok=true with
        // w=1), defeating the overflow defense on `need` below — clamp
        // to an impossible dimension so the bad-dimensions branch fires
        var v = 0L
        var any = false
        while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
          v = math.min(v * 10 + (blob(i) - '0'), Int.MaxValue.toLong)
          i += 1; any = true
        }
        if (!any) -1 else v.toInt
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      // pixel byte count in Long arithmetic: a crafted header like
      // "P6 46341 46341 255" overflows Int (negative need would pass the
      // length check and copyOfRange would throw, escaping the error-row
      // channel), and 65536×65536 wraps to 0 (bogus ok=true). Any real
      // frame is bounded by the blob length anyway.
      val need = if (w > 0 && h > 0) w.toLong * h * 3 else -1L
      if (w <= 0 || h <= 0 || need > Int.MaxValue) Left("bad dimensions")
      else if (maxval <= 0 || maxval > 255) Left("unsupported maxval")
      else if (i >= blob.length
          || !(blob(i) == ' ' || blob(i) == '\n'
            || blob(i) == '\r' || blob(i) == '\t')) {
        // the P6 spec requires exactly ONE whitespace byte between
        // maxval and the raster; consuming whatever byte is there would
        // shift every pixel by one and return ok=true over a garbage
        // raster instead of an error row
        Left("missing whitespace after maxval")
      } else {
        i += 1 // exactly one whitespace byte after maxval
        if ((blob.length - i).toLong < need) Left("truncated pixel data")
        else Right((w, h,
          java.util.Arrays.copyOfRange(blob, i, i + need.toInt)))
      }
    }

    def decode(r: MediaRecord): DecodedMedia = parse(r.blob) match {
      case Left(err) =>
        DecodedMedia(r.media_id, r.kind,
          if (r.blob == null) 0L else r.blob.length.toLong,
          0, 0, 0, ok = false, err)
      case Right((w, h, _)) =>
        DecodedMedia(r.media_id, r.kind, r.blob.length.toLong,
          w, h, n_frames = 1, ok = true, error = null)
    }

    /** Integer luma plane ((77R + 150G + 29B) >> 8 — the BT.601 integer
      * approximation) from decoded pixels; the input m03's blockhash fold
      * runs over when the slot is plugged in (MediaDecodeSpec). Failed
      * decodes yield an empty plane (the ok=false error row carries the
      * cause). */
    def lumaPlane(blob: Array[Byte]): Array[Long] = parse(blob) match {
      case Left(_) => Array.empty[Long]
      case Right((w, h, px)) =>
        val out = new Array[Long](w * h)
        var p = 0
        while (p < w * h) {
          val r = px(p * 3) & 0xFF
          val g = px(p * 3 + 1) & 0xFF
          val b = px(p * 3 + 2) & 0xFF
          out(p) = ((77 * r + 150 * g + 29 * b) >> 8).toLong
          p += 1
        }
        out
    }
  }

  /** Minimal P6 writer — the fixture twin of [[PpmDecoder]]: tile `src`
    * bytes into a w×h RGB raster by modular indexing (empty input →
    * all-zero raster). Deterministic, so an oracle can compute what the
    * decoder must recover without ever parsing the container — m06 uses
    * exactly that to gate the full bytes→pixels→signature loop. */
  object PpmEncoder {
    def encode(w: Int, h: Int, src: Array[Byte]): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val px = new Array[Byte](w * h * 3)
      if (src.nonEmpty) {
        var j = 0
        while (j < px.length) { px(j) = src(j % src.length); j += 1 }
      }
      header ++ px
    }
  }

  /** Decode media → per-pixel luma plane rows `(media_id, ok, lumas)`,
    * partition-wise like [[decodeAll]]. Downstream, m03's 16-block
    * signature fold applies to `lumas` unchanged — the pixel-domain form
    * of the byte-domain declared query. */
  def decodeLuma(media: Dataset[MediaRecord])
      : Dataset[(Long, Boolean, Array[Long])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val lum = PpmDecoder.lumaPlane(r.blob)
        (r.media_id, lum.nonEmpty, lum)
      }
    }
  }

  /** Frame sampling plan for video blobs: every `stride`-th frame index up
    * to n_frames — pure column math over the decoded metadata, so the frame
    * extraction stage receives (media_id, frame_idx) work units it can
    * repartition freely. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame = {
    // stride is plan-time config — fail construction, not the job
    require(stride > 0, s"stride must be > 0 (got $stride)")
    // n_frames > 0: sequence(0, -1, stride) THROWS ('Illegal sequence
    // boundaries'), so one zero-frame container from a decoder would
    // fail every row of the job instead of being skipped — a zero-frame
    // video has no frames to sample, which is a filter, not an error
    decoded.filter(col("ok") && col("kind") === "video"
        && col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))
  }
}
