package graft.plans

import graft.SparkSuite
import graft.functions.GraftFunctions.hamming64
import org.apache.spark.sql.functions._

/** Randomized identity sweep for HammingBlockJoinRewrite: seeded random
  * 64-bit codes (clustered so thresholds actually match) joined under
  * every spelling-relevant k in 0..15 must reproduce the naive JVM
  * evaluation's multiset exactly — including the SELF-join path, where
  * the rule's SHUFFLE_HASH hint routes both sides through one reused
  * exchange (the d25 shape). Fixed seeds keep the sweep deterministic. */
class HammingRewritePropSpec extends SparkSuite {

  /** Codes clustered around a few centers with small random bit flips,
    * so every k has qualifying and non-qualifying pairs. */
  private def codes(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val centers = Seq.fill(4)(rnd.nextLong())
    (0 until n).map { i =>
      var c = centers(rnd.nextInt(centers.size))
      val flips = rnd.nextInt(10)
      for (_ <- 0 until flips) c ^= 1L << rnd.nextInt(64)
      (i.toLong, c)
    }
  }

  test("10 seeded rounds with random k in 0..15 match the naive " +
      "evaluation exactly (two-sided joins)") {
    val sess = spark
    import sess.implicits._
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(100 + seed)
      val k = rnd.nextInt(16)
      val l = codes(seed, 40)
      val r = codes(seed + 50, 30)
      val got = l.toDF("lid", "lc")
        .join(r.toDF("rid", "rc"), hamming64(col("lc"), col("rc")) <= k)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        (li, lc) <- l; (ri, rc) <- r
        if java.lang.Long.bitCount(lc ^ rc) <= k
      } yield (li, ri)).sorted
      assert(got == want, s"seed $seed k=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("self-join path (one frame both sides, a<b ordering — the d25 " +
      "shape through the SHUFFLE_HASH reuse hint) matches the naive " +
      "evaluation across seeded rounds") {
    val sess = spark
    import sess.implicits._
    for (seed <- 11 to 16) {
      val rnd = new scala.util.Random(200 + seed)
      val k = rnd.nextInt(16)
      val base = codes(seed, 50)
      val fp = base.toDF("id", "c")
      val a = fp.select(col("id").as("a_id"), col("c").as("a_c"))
      val b = fp.select(col("id").as("b_id"), col("c").as("b_c"))
      val joined = a.crossJoin(b)
        .filter(col("a_id") < col("b_id")
          && hamming64(col("a_c"), col("b_c")) <= k)
        .select("a_id", "b_id")
      val got = joined.collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        (ai, ac) <- base; (bi, bc) <- base
        if ai < bi && java.lang.Long.bitCount(ac ^ bc) <= k
      } yield (ai, bi)).sorted
      assert(got == want, s"seed $seed k=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("INNER two-phase (wide payload): 8 seeded rounds with random k, " +
      "duplicate rows and an extra scalar conjunct match the naive " +
      "evaluation exactly under the forced floor and without it") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 70 to 73) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        val k = rnd.nextInt(16)
        def code() = rnd.nextLong() & 0xFFFFL // narrow range: dense matches
        // duplicates on both sides exercise the multiplicity contract
        val l0 = Seq.fill(25)((rnd.nextInt(8).toLong, code()))
        val l = (l0 ++ l0.take(3)).map { case (g, c) =>
          (g, c, s"text-$g-$c") }
        val r0 = Seq.fill(15)((rnd.nextInt(8).toLong, code()))
        val r = r0 ++ r0.take(2)
        val got = l.toDF("lg", "lc", "ltext")
          .join(r.toDF("rg", "rc"),
            hamming64(col("lc"), col("rc")) <= k && col("lg") =!= col("rg"))
          .select("lg", "lc", "rg", "rc").collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
          .toSeq.sorted
        val want = (for {
          (lg, lc, _) <- l; (rg, rc) <- r
          if java.lang.Long.bitCount(lc ^ rc) <= k && lg != rg
        } yield (lg, lc, rg, rc)).sorted
        assert(got == want,
          s"forced=$forced seed $seed k=$k: got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("LEFT SEMI hamming: 8 seeded rounds with random k (both in-place " +
      "and forced two-phase) match the naive semi evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 60 to 63) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        val k = rnd.nextInt(16)
        def code() = rnd.nextLong() & 0xFFFFL // narrow range: dense matches
        val l = Seq.fill(30)((rnd.nextInt(10).toLong, code()))
        val r = Seq.fill(15)((rnd.nextInt(10).toLong, code()))
        val got = l.toDF("lid", "lc")
          .join(r.toDF("rid", "rc"),
            graft.functions.GraftFunctions.hamming64(col("lc"), col("rc")) <= k,
            "left_semi")
          .select("lid").collect().map(_.getLong(0)).toSeq.sorted
        val want = l.collect { case (li, lc)
            if r.exists { case (_, rc) =>
              java.lang.Long.bitCount(lc ^ rc) <= k } => li }.sorted
        assert(got == want,
          s"forced=$forced seed $seed k=$k: got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }
}
