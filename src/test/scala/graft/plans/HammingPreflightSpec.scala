package graft.plans

import graft.SparkSuite
import graft.functions.GraftFunctions.hamming64
import org.apache.spark.sql.functions._

/** The opt-in Hamming preflight hook
  * (`spark.graft.hammingBlockJoinRewrite.preflight = warn`): on rewrite
  * fire it runs the d41 hot-block audit over the join's children and
  * logs estimate + worst (block-index, block-value); with the conf
  * unset it stays silent — OverlapPreflightSpec's contract, transposed
  * to the second rewrite family. */
class HammingPreflightSpec extends SparkSuite {

  /** Collects the rewrite rule's log lines while `body` runs. */
  private def capturing(body: => Unit): Seq[String] =
    LogCapture.capturing(classOf[HammingBlockJoinRewrite])(body)

  /** Golden-ratio-spread high bits with the low 5-bit block CLEARED:
    * block 0's value 0 appears in every row of both sides (the
    * zero-heavy-block skew of degenerate fingerprints), contributing
    * 30·30 = 900 candidate rows through one (index, value) key while
    * the other twelve blocks stay near-uniform. */
  private def skewedJoinCount(): Long = {
    val sess = spark
    import sess.implicits._
    val fps = (1L to 30L).map(i => (i * 0x9E3779B97F4A7C15L) & ~31L)
    val left = fps.zipWithIndex
      .map { case (f, i) => (i.toLong, f) }.toDF("lid", "lfp")
    val right = fps.zipWithIndex
      .map { case (f, i) => (i.toLong, f) }.toDF("rid", "rfp")
    left.join(right, hamming64(col("lfp"), col("rfp")) <= 12).count()
  }

  test("preflight=warn logs the candidate estimate with the hot block " +
      "named and the hot-block diagnosis") {
    spark.conf.set(ScaleGuards.HammingPreflightKey, "warn")
    try {
      // at least the 30 distance-0 diagonal pairs must survive
      val lines = capturing { assert(skewedJoinCount() >= 30L) }
      val pf = lines.filter(_.contains("hamming-block rewrite preflight:"))
      assert(pf.nonEmpty, s"expected a preflight line, got: $lines")
      val line = pf.head
      assert(line.contains("worst_block_index=0"), line)
      assert(line.contains("worst_block_value=0"), line)
      assert(line.contains("max_block_rows=900"), line)
      assert(line.contains("hot-block"), line)
    } finally spark.conf.unset(ScaleGuards.HammingPreflightKey)
  }

  test("without the conf the hook stays silent") {
    val lines = capturing { assert(skewedJoinCount() >= 30L) }
    assert(!lines.exists(_.contains("hamming-block rewrite preflight")),
      s"preflight must not run unasked: $lines")
  }

  test("sampled preflight names the SAME worst block and diagnosis as " +
      "the exact audit, with sample_fraction provenance on the line") {
    spark.conf.set(ScaleGuards.HammingPreflightKey, "warn")
    spark.conf.set(ScaleGuards.HammingPreflightSampleKey, "0.5")
    try {
      val lines = capturing { assert(skewedJoinCount() >= 30L) }
      val pf = lines.filter(_.contains("hamming-block rewrite preflight:"))
      assert(pf.nonEmpty, s"expected a preflight line, got: $lines")
      val line = pf.head
      // block 0's value 0 appears in every row of both sides: any
      // non-empty sample names the same hot (index, value) key
      assert(line.contains("worst_block_index=0"), line)
      assert(line.contains("worst_block_value=0"), line)
      assert(line.contains("hot-block"), line)
      assert(line.contains("sample_fraction=0.5"), line)
      // 1/f²-scaled estimate of the 900-row hot block: bounded above by
      // the all-rows-sampled 30·30·4 = 3600
      val hot = "max_block_rows=(\\d+)".r
        .findFirstMatchIn(line).map(_.group(1).toLong)
      assert(hot.exists(h => h > 0 && h <= 3600L), line)
    } finally {
      spark.conf.unset(ScaleGuards.HammingPreflightKey)
      spark.conf.unset(ScaleGuards.HammingPreflightSampleKey)
    }
  }

  test("preflight=fail refuses to plan the skewed-block join with the " +
      "audit line in the abort") {
    spark.conf.set(ScaleGuards.HammingPreflightKey, "fail")
    try {
      val ex = intercept[PreflightAbort] { skewedJoinCount() }
      assert(ex.getMessage.contains("hot-block"), ex.getMessage)
      assert(ex.getMessage.contains("worst_block_index=0"), ex.getMessage)
    } finally spark.conf.unset(ScaleGuards.HammingPreflightKey)
  }

  test("the hamming rule auto-samples BY DEFAULT above its own byte " +
      "floor (no sampleFraction conf), naming the same worst block with " +
      "sampling provenance on the line") {
    spark.conf.set(ScaleGuards.HammingPreflightKey, "warn")
    spark.conf.set(ScaleGuards.HammingPreflightAutoSampleMinBytesKey, "0")
    spark.conf.set(ScaleGuards.PreflightAutoSampleTargetRowsKey, "3")
    try {
      val lines = capturing { assert(skewedJoinCount() >= 30L) }
      val pf = lines.filter(_.contains("hamming-block rewrite preflight:"))
      assert(pf.nonEmpty, s"expected a preflight line, got: $lines")
      val line = pf.head
      assert(line.contains("sample_fraction="),
        s"auto gate must stamp sampling provenance: $line")
      // block 0's value 0 is in every row: any non-empty sample names it
      assert(line.contains("worst_block_index=0"), line)
      assert(line.contains("worst_block_value=0"), line)
    } finally {
      spark.conf.unset(ScaleGuards.HammingPreflightKey)
      spark.conf.unset(ScaleGuards.HammingPreflightAutoSampleMinBytesKey)
      spark.conf.unset(ScaleGuards.PreflightAutoSampleTargetRowsKey)
    }
  }
}
