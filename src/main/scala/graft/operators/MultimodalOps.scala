package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The corpus has no real image/audio bytes, so the declared query treats the
  * document text's UTF-8 encoding as the opaque blob (deterministic, oracle-
  * reproducible) and derives metadata the way a decode stage would (byte
  * length, fake dimensions, leading magic byte). The *real* Spark plumbing —
  * a typed `MediaRecord` schema, partition-wise batch decode via
  * mapPartitions with a clearly-marked stub decoder — is in
  * [[graft.streaming.MediaPipeline]] with its own spec; this query gates the
  * column-level semantics in the oracle.
  */
object MultimodalOps {

  private def m01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        (octet_length(col("blob")) % 640).cast("long").as("fake_width"),
        ((octet_length(col("blob")) * 7) % 480).cast("long").as("fake_height"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("magic_byte"),
        lit(3L).as("channels"))
      .orderBy(col("doc_id"))

  private val m01Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS fake_height,
      |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS magic_byte,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling over the opaque blob: fixed 256-byte frames —
    * `ceil(n_bytes / 256)` of them, from `sequence(0, (max(n,1)−1) div 256)`
    * so an exact multiple of 256 does not emit a phantom frame past the end
    * and an empty blob still yields its single (empty) frame — keep every
    * second frame (stride-2 sample), emit the frame offset and its leading
    * byte. Deterministic stand-in for a video frame-sample stage (the real
    * decoder slot is [[graft.streaming.MediaPipeline]]'s mapPartitions
    * stub). `magic` reads the character at the frame's byte offset — an
    * ASCII-only corpus assumption (for multibyte payloads a byte-indexed
    * reader belongs in the decode stage). Pure per-row explode:
    * embarrassingly parallel, output rows ∝ blob bytes / 512, no shuffle
    * before the final order. */
  private def m02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("n_bytes", octet_length(col("text").cast("binary")))
      .select(col("doc_id"), col("text"), col("n_bytes"),
        explode(expr(
          "sequence(0, CAST((greatest(n_bytes, 1) - 1) div 256 AS INT))"))
          .as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0)
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * 256L).as("offset_bytes"),
        expr("ascii(substring(text, frame_idx * 256 + 1, 1))")
          .cast("long").as("magic"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val m02Sql =
    """SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(frame_idx * 256 AS BIGINT) AS offset_bytes,
      |  CAST(ascii(substr(text, CAST(frame_idx * 256 + 1 AS INT), 1)) AS BIGINT)
      |    AS magic
      |FROM (SELECT doc_id, text,
      |    unnest(range(0,
      |      (greatest(octet_length(encode(text)), 1) - 1) // 256 + 1))
      |      AS frame_idx
      |  FROM documents) f
      |WHERE frame_idx % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Blockhash-style perceptual near-dup over the opaque blob — the
    * image-dedup shape (blockhash.org: split the image into a fixed grid,
    * set each signature bit by comparing its block's mass against the
    * global mean) applied to the byte domain: 16 equal byte-slices, bit b
    * set iff block b's byte-sum exceeds the blob mean (×16 cross-multiplied
    * so the compare stays in integers — no division to drift between
    * engines). Re-encoded, resized, or lightly-edited copies of the same
    * payload keep most blocks' relative mass, so they collide where exact
    * md5 dedup (d01's shape) cannot. The declared query emits the
    * collision buckets (signature, copy count, canonical = min doc_id) —
    * the dedup work-list a media pipeline feeds to a byte-accurate
    * comparator.
    *
    * Scale: the signature is ONE per-row fold inside whole-stage codegen
    * (no explode — block sums come from slice() inside the fold); the
    * bucket list is a hash aggregate keyed by the 16-bit signature with
    * map-side partials. Nothing pairwise: candidate verification joins the
    * bucket work-list, never doc × doc. Hamming-tolerant lookup composes
    * via d04's pigeonhole byte-banding over the same signatures. */
  private def m03(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documentsSpread
      // (?d) = UNIX_LINES: Java's default '.' also excludes \r, \u0085,
      // \u2028, \u2029, while the oracle's RE2 '.' excludes only \n — a
      // \r in a document (Windows line endings are plain ASCII) would
      // silently diverge the byte stream, block boundaries, and hash
      .withColumn("codes",
        expr("transform(regexp_extract_all(text, '(?d).', 0), ch -> ascii(ch))"))
      .withColumn("n", size(col("codes")))
      .withColumn("total", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
      .withColumn("blockhash", expr(
        """aggregate(sequence(0, 15), 0L, (acc, b) -> acc +
          |  CASE WHEN aggregate(
          |      slice(codes, (b * n) div 16 + 1,
          |        ((b + 1) * n) div 16 - (b * n) div 16),
          |      0L, (a, x) -> a + x) * 16 > total
          |    THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .groupBy(col("blockhash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("blockhash"))

  private val m03Sql =
    """WITH sig AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(16), b ->
      |      CASE WHEN list_sum(codes[((b * n) // 16 + 1):(((b + 1) * n) // 16)])
      |          * 16 > total
      |        THEN (1::BIGINT << b) ELSE 0 END)) AS blockhash
      |  FROM (
      |    SELECT doc_id, codes, len(codes) AS n, list_sum(codes) AS total
      |    FROM (SELECT doc_id,
      |        list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))
      |        AS codes
      |      FROM documents) c) s)
      |SELECT CAST(blockhash AS BIGINT) AS blockhash,
      |  CAST(count(*) AS BIGINT) AS n_copies,
      |  CAST(min(doc_id) AS BIGINT) AS canonical_id
      |FROM sig
      |GROUP BY blockhash
      |HAVING count(*) >= 2
      |ORDER BY blockhash""".stripMargin

  /** Audio windowing over the opaque blob — the chunking stage every
    * speech pipeline runs before decode (Whisper-style models take fixed
    * windows with overlap): treat the blob as 16-bit mono PCM at a
    * per-row sample rate (doc-derived, deterministic), emit 1-second
    * windows (rate samples) with a 50% hop, each with its sample offset, byte offset and
    * span — the (media_id, window) work units that then `repartition`
    * freely into the mapPartitions decoder slot
    * ([[graft.streaming.MediaPipeline]]).
    *
    * Window count per clip = `floor(n_samples / hop)` minus trailing
    * windows that would start past `n_samples − hop` (half-open, full
    * windows only, plus one tail window when a half-hop remainder
    * exists) — expressed as `sequence` bounds in pure integer math so
    * both engines enumerate identical windows. Per-row explode only:
    * embarrassingly parallel, rows ∝ audio seconds, no shuffle before
    * the output sort. */
  private def m04(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("n_bytes", octet_length(col("text").cast("binary")))
      // fake but deterministic per-clip rate: 8k or 16k by doc parity
      .withColumn("rate",
        when(col("doc_id") % 2 === 0, 64L).otherwise(32L))
      .withColumn("n_samples", (col("n_bytes") / 2).cast("long"))
      .withColumn("hop", (col("rate") / 2).cast("long"))
      .filter(col("n_samples") >= col("hop"))
      .select(col("doc_id"), col("rate"), col("n_samples"), col("hop"),
        explode(expr(
          "sequence(0, CAST((n_samples - hop) div hop AS INT))"))
          .as("win_idx"))
      .select(
        col("doc_id"), col("rate"),
        col("win_idx").cast("long").as("win_idx"),
        (col("win_idx") * col("hop")).as("start_sample"),
        (col("win_idx") * col("hop") * 2).as("start_byte"),
        least(col("rate"), col("n_samples") - col("win_idx") * col("hop"))
          .as("win_samples"))
      .orderBy(col("doc_id"), col("win_idx"))

  private val m04Sql =
    """WITH a AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 64 ELSE 32 END AS rate,
      |    octet_length(encode(text)) // 2 AS n_samples,
      |    CASE WHEN doc_id % 2 = 0 THEN 32 ELSE 16 END AS hop
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, rate, n_samples, hop,
      |    unnest(range(0, (n_samples - hop) // hop + 1)) AS win_idx
      |  FROM a WHERE n_samples >= hop)
      |SELECT doc_id, CAST(rate AS BIGINT) AS rate,
      |  CAST(win_idx AS BIGINT) AS win_idx,
      |  CAST(win_idx * hop AS BIGINT) AS start_sample,
      |  CAST(win_idx * hop * 2 AS BIGINT) AS start_byte,
      |  CAST(least(rate, n_samples - win_idx * hop) AS BIGINT)
      |    AS win_samples
      |FROM w
      |ORDER BY doc_id, win_idx""".stripMargin

  /** Video/clip near-dup via shared frame fingerprints — the standard
    * "same footage, different container" detector: fingerprint every
    * sampled frame, invert to a fingerprint → clips index, and flag clip
    * pairs sharing ≥ 2 fingerprints with a containment-style similarity
    * (shared / min(frames)). Re-encodes and trims keep most frame bytes,
    * so they collide where whole-file hashing (d01's shape) cannot.
    * Frames here are m02's 256-byte blob slices, fingerprinted by md5 —
    * the decode-stage swap point for a real perceptual per-frame hash
    * (m03's blockhash) is documented in MediaPipeline.
    *
    * Scale: per-clip fingerprint arrays are built map-side
    * (`array_distinct(transform(...))` — no explode-then-distinct
    * shuffle), per-clip frame counts are `size(hs)` (free), and
    * candidates come from d02's group-and-expand on the fingerprint key
    * with the same hot-bucket cap — Σ bucket² cost, never clip × clip.
    * The two joins back for frame counts are keyed by doc id (broadcast-
    * able summaries at any scale). */
  private def m05(s: SparkSession, dir: String): DataFrame = {
    val hs = Tables(s, dir).documentsSpread
      .withColumn("n_bytes", octet_length(col("text").cast("binary")))
      .select(col("doc_id"), expr(
        """array_distinct(transform(
          |  sequence(0, CAST((greatest(n_bytes, 1) - 1) div 256 AS INT)),
          |  fi -> md5(cast(substring(text, fi * 256 + 1, 256) as binary))))"""
          .stripMargin).as("hs"))
      // cached: perDoc and the bucket explode both consume the
      // md5-per-256-byte-frame transform (the dominant cost)
      .cache()
    val perDoc = hs.select(col("doc_id"), size(col("hs")).as("n_frames"))
    val buckets = hs
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    DedupOps.expandPairs(buckets)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(perDoc.select(col("doc_id").as("a_id"), col("n_frames").as("fa")),
        "a_id")
      .join(perDoc.select(col("doc_id").as("b_id"), col("n_frames").as("fb")),
        "b_id")
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        col("n_shared"),
        expr("n_shared * 1000 div least(fa, fb)").as("sim_permille"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val m05Sql =
    """WITH hs AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |      range(0, (greatest(octet_length(encode(text)), 1) - 1) // 256 + 1),
      |      fi -> md5(substr(text, CAST(fi * 256 + 1 AS INT), 256)))) AS hs
      |  FROM documents),
      |f AS (SELECT doc_id, unnest(hs) AS h FROM hs),
      |nf AS (SELECT doc_id, len(hs) AS n_frames FROM hs),
      |-- mirror the Spark side's bucket bounds (size BETWEEN 2 AND 1000):
      |-- an unmirrored hot-bucket cap would drop pairs from one engine
      |-- only the moment any frame hash is shared by > 1000 documents
      |fb2 AS (
      |  SELECT f.doc_id, f.h FROM f
      |  JOIN (SELECT h FROM f GROUP BY h
      |        HAVING count(*) BETWEEN 2 AND 1000) k ON k.h = f.h),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM fb2 a JOIN fb2 b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT doc_a, doc_b, n_shared,
      |  CAST(n_shared * 1000 // least(fa.n_frames, fb.n_frames) AS BIGINT)
      |    AS sim_permille
      |FROM shared
      |JOIN nf fa ON fa.doc_id = doc_a
      |JOIN nf fb ON fb.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Audio perceptual fingerprint (Chromaprint/landmark-style, on m04's
    * window grid): per clip, window energies over the PCM stand-in bytes,
    * then ONE bit per consecutive-window energy DELTA (rising=1) packed
    * into an 8-bit fingerprint — deltas survive gain changes that raw
    * energies don't, which is the whole trick behind audio matching.
    * Output is each clip's fingerprint plus its collision-bucket size:
    * the bucket join (m03's shape in the audio domain) is where near-dup
    * candidates come from at corpus scale.
    *
    * Scale: energies, deltas, and the packed fingerprint are ONE nested
    * per-row fold — no explode, no shuffle until the 256-bucket count
    * aggregate (map-side combined, constant output). The real decoder
    * slot stays MediaPipeline's documented stub; everything Spark-side
    * (window grid, delta bits, bucket join) is the production shape. */
  private def m06(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir).documentsSpread
      .withColumn("n_bytes", octet_length(col("text").cast("binary")))
      .withColumn("rate",
        when(col("doc_id") % 2 === 0, 64L).otherwise(32L))
      .withColumn("n_samples", (col("n_bytes") / 2).cast("long"))
      .withColumn("hop", (col("rate") / 2).cast("long"))
      .filter(col("n_samples") >= col("hop"))
      .withColumn("n_win",
        (expr("(n_samples - hop) div hop") + 1).cast("int"))
      // per-window byte-energy over the 2-byte samples (decode stand-in)
      .withColumn("energies", expr(
        """transform(sequence(0, n_win - 1), w ->
          |  aggregate(
          |    sequence(w * hop * 2 + 1,
          |      least(n_bytes, (w * hop + least(rate, n_samples - w * hop)) * 2)),
          |    0L, (acc, i) -> acc + ascii(substring(text, CAST(i AS INT), 1))))"""
          .stripMargin))
      .withColumn("fingerprint", expr(
        """IF(n_win < 2, 0L,
          |  aggregate(sequence(0, least(7, n_win - 2)), 0L,
          |    (acc, d) -> IF(energies[d + 1] > energies[d],
          |      acc | shiftleft(1L, d), acc)))""".stripMargin))
      // pruned + cached: the bucket aggregate AND the join back both
      // consume the fold output — uncached, the O(bytes) nested
      // window-energy fold (the query's dominant cost) runs twice
      .select(col("doc_id"), col("fingerprint"), col("n_win"))
      .cache()
    val buckets = base.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("bucket_size"))
    base.join(broadcast(buckets), "fingerprint")
      .select(col("doc_id"), col("fingerprint"),
        col("n_win").cast("long").as("n_windows"), col("bucket_size"))
      .orderBy(col("doc_id"))
  }

  private val m06Sql =
    """WITH a AS (
      |  SELECT doc_id, text,
      |    octet_length(encode(text)) AS n_bytes,
      |    CASE WHEN doc_id % 2 = 0 THEN 64 ELSE 32 END AS rate,
      |    octet_length(encode(text)) // 2 AS n_samples,
      |    CASE WHEN doc_id % 2 = 0 THEN 32 ELSE 16 END AS hop
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, text, n_bytes, rate, n_samples, hop,
      |    CAST((n_samples - hop) // hop + 1 AS INT) AS n_win
      |  FROM a WHERE n_samples >= hop),
      |e AS (
      |  SELECT doc_id, n_win,
      |    list_transform(range(0, n_win), w ->
      |      list_sum(list_transform(
      |        range(w * hop * 2 + 1,
      |          least(n_bytes,
      |            (w * hop + least(rate, n_samples - w * hop)) * 2) + 1),
      |        i -> ascii(substr(text, CAST(i AS INT), 1))))) AS energies
      |  FROM w),
      |fp AS (
      |  SELECT doc_id, n_win,
      |    CAST(coalesce(list_sum(list_transform(
      |      range(0, least(8, n_win - 1)), d ->
      |      CASE WHEN energies[CAST(d AS INT) + 2]
      |          > energies[CAST(d AS INT) + 1]
      |        THEN (1::BIGINT << CAST(d AS INT)) ELSE 0 END)), 0) AS BIGINT)
      |      AS fingerprint
      |  FROM e),
      |bk AS (SELECT fingerprint, count(*) AS bucket_size FROM fp
      |  GROUP BY fingerprint)
      |SELECT doc_id, fp.fingerprint,
      |  CAST(n_win AS BIGINT) AS n_windows,
      |  CAST(bucket_size AS BIGINT) AS bucket_size
      |FROM fp JOIN bk USING (fingerprint)
      |ORDER BY doc_id""".stripMargin

  /** Scene-change (shot-boundary) detection — the clip-segmentation
    * primitive a video curation pipeline runs before sampling training
    * frames (sample per SCENE, not per fixed stride, or a 10-minute
    * static shot dominates the clip's frames): per clip, m05's 256-byte
    * frame grid reduces to one integer byte-mass per frame, and a cut is
    * declared where consecutive masses jump by more than 25% (integer
    * inequality |Δ|·4 > prev — no float, no threshold tuning in the
    * decision). One nested per-row fold (O(bytes) per clip, the decoder
    * stand-in shape of m04/m06), zero shuffles before the output sort;
    * each clip's cut list rides along as a compact string. */
  private def m07(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documentsSpread
      .withColumn("n_bytes", octet_length(col("text").cast("binary")))
      .withColumn("n_frames",
        (expr("(greatest(n_bytes, 1) - 1) div 256") + 1).cast("int"))
      .withColumn("masses", expr(
        """transform(sequence(0, n_frames - 1), fi ->
          |  aggregate(sequence(fi * 256 + 1, least(n_bytes, (fi + 1) * 256)),
          |    0L, (acc, i) -> acc + ascii(substring(text, CAST(i AS INT), 1))))"""
          .stripMargin))
      // sequence(1, 0) counts DOWN in Spark — guard the 1-frame clip
      .withColumn("cuts", expr(
        """IF(n_frames < 2, array(),
          |  filter(sequence(1, n_frames - 1),
          |    i -> abs(masses[i] - masses[i - 1]) * 4 > masses[i - 1]))"""
          .stripMargin))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        size(col("cuts")).cast("long").as("n_cuts"),
        concat_ws(",", expr("transform(cuts, c -> cast(c as string))"))
          .as("cut_frames"))
      .orderBy(col("doc_id"))

  private val m07Sql =
    """WITH a AS (
      |  SELECT doc_id,
      |    octet_length(encode(text)) AS n_bytes,
      |    (greatest(octet_length(encode(text)), 1) - 1) // 256 + 1
      |      AS n_frames,
      |    text
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, n_frames,
      |    list_transform(range(0, n_frames), fi ->
      |      list_sum(list_transform(
      |        range(fi * 256 + 1, least(n_bytes, (fi + 1) * 256) + 1),
      |        i -> ascii(substr(text, CAST(i AS INT), 1))))) AS masses
      |  FROM a),
      |c AS (
      |  SELECT doc_id, n_frames,
      |    list_transform(
      |      list_filter(range(2, n_frames + 1),
      |        i -> abs(masses[i] - masses[i - 1]) * 4 > masses[i - 1]),
      |      i -> i - 1) AS cuts
      |  FROM m)
      |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(len(cuts) AS BIGINT) AS n_cuts,
      |  coalesce(
      |    array_to_string(list_transform(cuts, c -> CAST(c AS VARCHAR)), ','),
      |    '') AS cut_frames
      |FROM c
      |ORDER BY doc_id""".stripMargin

  /** ViT patch-grid enumeration — the image-side work-unit calculation a
    * vision-transformer ingest runs from METADATA ALONE (no decode): per
    * image, the 16×16 patch grid (ceil-divided per axis), total patch
    * count, the token sequence length it implies (patches + CLS — the
    * number that decides whether the image fits the context budget or
    * needs downscaling), and the center patch's flattened index (the
    * standard crop-anchor). Dimensions clamp to ≥16 so degenerate
    * metadata still yields one patch. m02/m04 enumerate 1-D frame/window
    * grids; this is the 2-D member of the family. Pure per-row integer
    * codegen, shuffle-free to the output sort. */
  private def m08(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("blob", col("text").cast("binary"))
      .select(col("doc_id"),
        greatest(lit(16L), (octet_length(col("blob")) % 640).cast("long"))
          .as("width"),
        greatest(lit(16L),
          ((octet_length(col("blob")) * 7) % 480).cast("long"))
          .as("height"))
      .withColumn("patches_x", expr("(width + 15) div 16"))
      .withColumn("patches_y", expr("(height + 15) div 16"))
      .withColumn("n_patches", col("patches_x") * col("patches_y"))
      .withColumn("seq_len", col("n_patches") + 1L)
      .withColumn("center_idx",
        expr("(patches_y div 2) * patches_x + (patches_x div 2)"))
      .orderBy(col("doc_id"))

  private val m08Sql =
    """SELECT doc_id, width, height,
      |  (width + 15) // 16 AS patches_x,
      |  (height + 15) // 16 AS patches_y,
      |  ((width + 15) // 16) * ((height + 15) // 16) AS n_patches,
      |  ((width + 15) // 16) * ((height + 15) // 16) + 1 AS seq_len,
      |  (((height + 15) // 16) // 2) * ((width + 15) // 16)
      |    + (((width + 15) // 16) // 2) AS center_idx
      |FROM (
      |  SELECT doc_id,
      |    greatest(16, CAST(octet_length(encode(text)) % 640 AS BIGINT))
      |      AS width,
      |    greatest(16,
      |      CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT))
      |      AS height
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Pixel-domain blockhash through the REAL container decoder — the
    * round-8 closure of the media loop: each document's character codes
    * (mod 256) are tiled into a genuine 16×12 binary-P6 PPM blob
    * ([[graft.streaming.MediaPipeline.PpmEncoder]]), the blob goes
    * through the production decode slot ([[graft.streaming.MediaPipeline
    * .decodeLuma]] → PpmDecoder's header parse + BT.601 integer luma),
    * and m03's 16-block signature fold runs over the DECODED pixels.
    * The DuckDB oracle computes the expected signature from first
    * principles (text codes → modular tiling → luma formula → fold)
    * WITHOUT ever seeing the container — a hash match therefore
    * certifies the whole bytes→pixels→signature path, not just the
    * fold. Scale: encode+decode are per-row map stages in one
    * mapPartitions pass (the decoder-slot shape); the only shuffles are
    * the spread repartition and the output sort. */
  private def m09(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.MediaPipeline
    val sess = s
    import sess.implicits._
    val media = Tables(s, dir).documentsSpread
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // mirror the oracle's source-byte selection EXACTLY: DuckDB's
        // regexp_extract_all(text, '.') yields one element per CODE
        // POINT and skips newlines — toCharArray would include '\n' and
        // split a non-BMP character into two surrogate units, silently
        // diverging the pixel stream on such documents (m03 already
        // uses the regex form on both sides)
        val src = text.codePoints().toArray
          .filter(_ != '\n'.toInt)
          .map(cp => (cp & 0xFF).toByte)
        MediaPipeline.MediaRecord(id, "image",
          MediaPipeline.PpmEncoder.encode(16, 12, src),
          "image/x-portable-pixmap")
      }
    MediaPipeline.decodeLuma(media).toDF("media_id", "ok", "lumas")
      .filter(col("ok"))
      .withColumn("n", size(col("lumas")))
      .withColumn("total", expr("aggregate(lumas, 0L, (a, x) -> a + x)"))
      .withColumn("pixel_blockhash", expr(
        """aggregate(sequence(0, 15), 0L, (acc, b) -> acc +
          |  CASE WHEN aggregate(
          |      slice(lumas, (b * n) div 16 + 1,
          |        ((b + 1) * n) div 16 - (b * n) div 16),
          |      0L, (a, x) -> a + x) * 16 > total
          |    THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("media_id").cast("long").as("doc_id"),
        col("pixel_blockhash"))
      .orderBy(col("doc_id"))
  }

  private val m09Sql =
    """WITH c AS (
      |  SELECT doc_id, list_transform(regexp_extract_all(text, '.'),
      |    ch -> ascii(ch) % 256) AS codes
      |  FROM documents),
      |px AS (SELECT doc_id, codes, len(codes) AS nc FROM c),
      |lum AS (
      |  SELECT doc_id, list_transform(range(192), p ->
      |    (77 * (CASE WHEN nc = 0 THEN 0
      |             ELSE codes[CAST((3 * p) % nc AS INT) + 1] END)
      |     + 150 * (CASE WHEN nc = 0 THEN 0
      |             ELSE codes[CAST((3 * p + 1) % nc AS INT) + 1] END)
      |     + 29 * (CASE WHEN nc = 0 THEN 0
      |             ELSE codes[CAST((3 * p + 2) % nc AS INT) + 1] END))
      |    // 256) AS lumas
      |  FROM px),
      |sig AS (SELECT doc_id, 192 AS n, list_sum(lumas) AS total, lumas
      |  FROM lum)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(list_sum(list_transform(range(16), b ->
      |    CASE WHEN
      |        list_sum(lumas[CAST((b * n) // 16 AS INT) + 1
      |          :CAST(((b + 1) * n) // 16 AS INT)]) * 16 > total
      |      THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)) AS BIGINT)
      |    AS pixel_blockhash
      |FROM sig
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "m01_multimodal_meta" -> QueryDef(m01, Some(m01Sql)),
    "m02_frame_sample" -> QueryDef(m02, Some(m02Sql)),
    "m03_blockhash_neardup" -> QueryDef(m03, Some(m03Sql)),
    "m04_audio_windows" -> QueryDef(m04, Some(m04Sql)),
    "m05_video_neardup" -> QueryDef(m05, Some(m05Sql)),
    "m06_audio_fingerprint" -> QueryDef(m06, Some(m06Sql)),
    "m07_scene_cuts" -> QueryDef(m07, Some(m07Sql)),
    "m08_vit_patch_grid" -> QueryDef(m08, Some(m08Sql)),
    "m09_ppm_pixel_blockhash" -> QueryDef(m09, Some(m09Sql)),
  )
}
