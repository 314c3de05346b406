package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The media decoder SLOT exercised end-to-end with a REAL codec:
  * [[MediaPipeline.PpmDecoder]] parses binary PPM (P6) with pure byte
  * math — no library — and plugs into the same `decodeAll` topology the
  * stub uses (identical schema, identical error-row channel), proving
  * the m-family plumbing carries genuine pixel decode, not just
  * metadata. The blockhash test runs m03's 16-block signature fold over
  * ACTUALLY DECODED luma planes and shows a re-encoded (brightness-
  * shifted) copy collides with its original while a different image
  * does not — the perceptual-dedup claim on real pixels. */
class MediaDecodeSpec extends SparkSuite {
  import MediaPipeline._

  /** Build a P6 blob from a pixel function. */
  private def ppm(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int))
      : Array[Byte] = {
    val header = s"P6\n# test image\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val o = (y * w + x) * 3
      body(o) = r.toByte; body(o + 1) = g.toByte; body(o + 2) = b.toByte
    }
    header ++ body
  }

  // a 32×8 gradient-with-a-bright-square test card
  private def card(shift: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val base = math.min(255, (x * 8 + shift) % 256)
    if (x >= 24 && y >= 4) (255, 255, 255) else (base, base / 2, base / 3)
  }

  test("PpmDecoder parses real P6 blobs through the stub's exact " +
      "topology: true dimensions, error rows for malformed blobs, " +
      "schema identical to the stub path") {
    val sess = spark
    import sess.implicits._
    val good = ppm(32, 8)(card(0))
    val media = Seq(
      MediaRecord(1L, "image", good, "image/x-portable-pixmap"),
      MediaRecord(2L, "image", "P6\n9999 9999\n255\n".getBytes("US-ASCII")
        ++ Array.fill[Byte](10)(0), "image/x-portable-pixmap"), // truncated
      MediaRecord(3L, "image", Array[Byte]('P', '3'), "image/x-portable-pixmap"),
      MediaRecord(4L, "image", Array.empty[Byte], "image/x-portable-pixmap"))
      .toDS()
    val real = MediaPipeline.decodeAll(media, PpmDecoder.decode)
    val stub = MediaPipeline.decodeAll(media)
    // slot-in ≡ stub-out topology: same schema, same row count, same
    // partition-wise shape — only the VALUES reflect genuine decoding
    assert(real.schema == stub.schema)
    val rows = real.collect().sortBy(_.media_id)
    assert(rows.length == 4)
    assert(rows(0).ok && rows(0).width == 32 && rows(0).height == 8,
      s"real dimensions must come from the container: ${rows(0)}")
    assert(!rows(1).ok && rows(1).error == "truncated pixel data")
    assert(!rows(2).ok && rows(2).error == "not a P6 ppm")
    assert(!rows(3).ok && rows(3).error == "empty blob")
    // the stub path cannot know the true width; the real path must
    val stubRow = stub.collect().minBy(_.media_id)
    assert(stubRow.width != 32 || stubRow.height != 8,
      "fixture self-check: stub features differ from true dimensions")
  }

  test("a 10+-digit PPM header dimension is an error row, not a " +
      "wrapped-Int bogus ok=true (12884901889 ≡ 1 mod 2^32 decoded as " +
      "width=1 before the Long-accumulating readInt)") {
    val sess = spark
    import sess.implicits._
    val crafted = "P6 12884901889 1 255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    val media = Seq(MediaRecord(1L, "image", crafted,
      "image/x-portable-pixmap")).toDS()
    val rows = MediaPipeline.decodeAll(media, PpmDecoder.decode).collect()
    assert(rows.length == 1 && !rows(0).ok,
      s"crafted overflow header must fail, got ${rows(0)}")
    assert(rows(0).error == "bad dimensions", rows(0).error)
  }

  test("sampleFrames skips zero-frame containers instead of crashing the " +
      "job (sequence(0,-1,stride) throws), and rejects stride <= 0 at " +
      "plan construction") {
    val sess = spark
    import sess.implicits._
    val decoded = Seq(
      (1L, true, "video", 10),
      (2L, true, "video", 0), // zero-frame container from a real decoder
      (3L, false, "video", 7) // decode error: never sampled
    ).toDF("media_id", "ok", "kind", "n_frames")
    val frames = MediaPipeline.sampleFrames(decoded, stride = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames == Set((1L, 0), (1L, 5)), frames)
    intercept[IllegalArgumentException](
      MediaPipeline.sampleFrames(decoded, stride = 0))
  }

  test("m03's blockhash fold over genuinely decoded luma planes: a " +
      "brightness-shifted re-encode collides with its original, a " +
      "different image does not") {
    val sess = spark
    import sess.implicits._
    val media = Seq(
      MediaRecord(10L, "image", ppm(32, 8)(card(0)), "ppm"),
      MediaRecord(11L, "image", ppm(32, 8)(card(6)), "ppm"), // re-encode
      MediaRecord(12L, "image", ppm(32, 8)((x, y) => // different image
        (if ((x + y) % 2 == 0) 250 else 3, 10, 200)), "ppm"),
      MediaRecord(13L, "image", Array[Byte]('x'), "ppm")) // decode failure
      .toDS()
    val lum = MediaPipeline.decodeLuma(media)
      .toDF("media_id", "ok", "codes")
    // m03's exact signature fold, input = decoded pixels instead of bytes
    val sig = lum.filter(col("ok"))
      .withColumn("n", size(col("codes")))
      .withColumn("total", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
      .withColumn("blockhash", expr(
        """aggregate(sequence(0, 15), 0L, (acc, b) -> acc +
          |  CASE WHEN aggregate(
          |      slice(codes, (b * n) div 16 + 1,
          |        ((b + 1) * n) div 16 - (b * n) div 16),
          |      0L, (a, x) -> a + x) * 16 > total
          |    THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("media_id"), col("blockhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.keySet == Set(10L, 11L, 12L), "failed decode drops out")
    assert(sig(10L) == sig(11L),
      s"perceptual collision expected: ${sig(10L)} vs ${sig(11L)}")
    assert(sig(10L) != sig(12L),
      "different content must not collide")
  }
}
