package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Randomized identity sweep for SetOverlapJoinRewrite: across seeded
  * random tables — small element pools (forcing heavy collisions),
  * array lengths 0..6, ~15% null elements, duplicate elements and
  * duplicate rows — the rewritten plans must reproduce the naive JVM
  * evaluation's multiset EXACTLY, for all three spellings (overlap,
  * membership, intersect-size threshold). Fixed seeds keep the sweep
  * deterministic; the pools are tiny on purpose (collision-rich inputs
  * are where a dedup-pin bug would show). */
class OverlapRewritePropSpec extends SparkSuite {

  private val pool = Vector("a", "b", "c", "d", "e")

  private def randArr(rnd: scala.util.Random): Seq[String] =
    Seq.fill(rnd.nextInt(7))(
      if (rnd.nextInt(100) < 15) null else pool(rnd.nextInt(pool.size)))

  test("overlap spelling: 10 seeded random rounds match the naive " +
      "evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.fill(20)((rnd.nextInt(6).toLong, randArr(rnd)))
      val r = Seq.fill(15)((rnd.nextInt(6).toLong, randArr(rnd)))
      val got = l.toDF("lid", "la")
        .join(r.toDF("rid", "ra"), arrays_overlap(col("la"), col("ra")))
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        (li, la) <- l; (ri, ra) <- r
        if la.exists(x => x != null && ra.contains(x))
      } yield (li, ri)).sorted
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("membership spelling: 10 seeded random rounds match the naive " +
      "evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 11 to 20) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.fill(20)((rnd.nextInt(6).toLong, randArr(rnd)))
      val r = Seq.fill(12)((rnd.nextInt(6).toLong,
        if (rnd.nextInt(100) < 20) null else pool(rnd.nextInt(pool.size))))
      val got = l.toDF("lid", "tags")
        .join(r.toDF("rid", "tag"), array_contains(col("tags"), col("tag")))
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        (li, la) <- l; (ri, tg) <- r
        if tg != null && la.exists(x => x != null && x == tg)
      } yield (li, ri)).sorted
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("threshold spelling over null-free long arrays: 10 seeded rounds " +
      "match the naive evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 21 to 30) {
      val rnd = new scala.util.Random(seed)
      def arr() = Seq.fill(rnd.nextInt(7))(rnd.nextInt(8).toLong)
      val k = 1 + rnd.nextInt(3)
      val l = Seq.fill(20)((rnd.nextInt(6).toLong, arr()))
      val r = Seq.fill(15)((rnd.nextInt(6).toLong, arr()))
      val got = l.toDF("lid", "la")
        .join(r.toDF("rid", "ra"),
          size(array_intersect(col("la"), col("ra"))) >= k)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        (li, la) <- l; (ri, ra) <- r
        if la.distinct.count(ra.contains) >= k
      } yield (li, ri)).sorted
      assert(got == want,
        s"seed $seed k=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("overlap spelling under FORCED two-phase: 10 seeded rounds match " +
      "the naive evaluation exactly (collision-rich pools)") {
    val sess = spark
    import sess.implicits._
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      for (seed <- 31 to 40) {
        val rnd = new scala.util.Random(seed)
        val l = Seq.fill(20)((rnd.nextInt(6).toLong, randArr(rnd)))
        val r = Seq.fill(15)((rnd.nextInt(6).toLong, randArr(rnd)))
        val got = l.toDF("lid", "la")
          .join(r.toDF("rid", "ra"), arrays_overlap(col("la"), col("ra")))
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        val want = (for {
          (li, la) <- l; (ri, ra) <- r
          if la.exists(x => x != null && ra.contains(x))
        } yield (li, ri)).sorted
        assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
      }
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  test("high thresholds k in 2..5 over longer arrays (the prefix-slice " +
      "regime): 12 seeded rounds, both topologies, match the naive " +
      "evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 46 to 51) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        def arr() = Seq.fill(2 + rnd.nextInt(9))(rnd.nextInt(12).toLong)
        val k = 2 + rnd.nextInt(4)
        val l = Seq.fill(25)((rnd.nextInt(8).toLong, arr()))
        val r = Seq.fill(18)((rnd.nextInt(8).toLong, arr()))
        val got = l.toDF("lid", "la")
          .join(r.toDF("rid", "ra"),
            size(array_intersect(col("la"), col("ra"))) >= k)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        val want = (for {
          (li, la) <- l; (ri, ra) <- r
          if la.distinct.count(ra.contains) >= k
        } yield (li, ri)).sorted
        assert(got == want,
          s"forced=$forced seed $seed k=$k: got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("strict-Jaccard spelling with random tau (the dynamic-prefix " +
      "regime): 12 seeded rounds, both topologies, match the naive " +
      "double-arithmetic evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 52 to 57) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        def arr() = Seq.fill(rnd.nextInt(10))(rnd.nextInt(10).toLong)
        val tau = rnd.nextInt(8) / 10.0 // 0.0 .. 0.7, exact doubles not required
        val l = Seq.fill(22)((rnd.nextInt(8).toLong, arr()))
        val r = Seq.fill(16)((rnd.nextInt(8).toLong, arr()))
        val got = l.toDF("lid", "la")
          .join(r.toDF("rid", "ra"),
            size(array_intersect(col("la"), col("ra")))
              > lit(tau) * size(array_union(col("la"), col("ra"))))
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        val want = (for {
          (li, la) <- l; (ri, ra) <- r
          i = la.distinct.count(ra.distinct.contains)
          u = (la ++ ra).distinct.size
          if i.toDouble > tau * u.toDouble
        } yield (li, ri)).sorted
        assert(got == want,
          s"forced=$forced seed $seed tau=$tau: " +
            s"got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("STRING elements through the hash-ordered prefix (threshold and " +
      "strict Jaccard, forced two-phase): 12 seeded rounds match the " +
      "naive evaluation exactly — the (xxhash64, elem) struct order must " +
      "lose no pair regardless of where witnesses land in it") {
    val sess = spark
    import sess.implicits._
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      // encoders declare string elements nullable; the recognizers' static
      // null-free gate needs containsNull=false — rebuild via coalesce
      def nn(df: org.apache.spark.sql.DataFrame, arr: String) =
        df.withColumn(arr, expr(s"transform($arr, x -> coalesce(x, 'z'))"))
      for (jaccard <- Seq(false, true); seed <- 70 to 75) {
        val rnd = new scala.util.Random(seed)
        val pool = ('a' to 'n').map(c => s"w_$c$c")
        def arr() = Seq.fill(1 + rnd.nextInt(8))(pool(rnd.nextInt(pool.size)))
        val l = Seq.fill(24)((rnd.nextInt(9).toLong, arr()))
        val r = Seq.fill(17)((rnd.nextInt(9).toLong, arr()))
        val (cond, naive) =
          if (jaccard) {
            val tau = (1 + rnd.nextInt(7)) / 10.0
            (size(array_intersect(col("la"), col("ra")))
              > lit(tau) * size(array_union(col("la"), col("ra"))),
              (la: Seq[String], ra: Seq[String]) => {
                val i = la.distinct.count(ra.distinct.contains)
                val u = (la ++ ra).distinct.size
                i.toDouble > tau * u.toDouble
              })
          } else {
            val k = 2 + rnd.nextInt(4)
            (size(array_intersect(col("la"), col("ra"))) >= k,
              (la: Seq[String], ra: Seq[String]) =>
                la.distinct.count(ra.contains) >= k)
          }
        val joined = nn(l.toDF("lid", "la"), "la")
          .join(nn(r.toDF("rid", "ra"), "ra"), cond)
          .select("lid", "rid")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("named_struct"),
          s"hash-order prefix expected (jaccard=$jaccard seed=$seed):\n" +
            plan.linesIterator.take(12).mkString("\n"))
        val got = joined.collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        val want = (for {
          (li, la) <- l; (ri, ra) <- r if naive(la, ra)
        } yield (li, ri)).sorted
        assert(got == want,
          s"jaccard=$jaccard seed=$seed: got ${got.size}, want ${want.size}")
      }
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  test(">= Jaccard spelling with random tau > 0 (witnessed union " +
      "empty-cross): 12 seeded rounds, both topologies, match the naive " +
      "double-arithmetic evaluation exactly — empty arrays are FREQUENT " +
      "in these pools, so the union branch carries real weight") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 60 to 65) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        // nextInt(5): ~20% empty arrays — both branches exercised
        def arr() = Seq.fill(rnd.nextInt(5))(rnd.nextInt(10).toLong)
        val tau = (1 + rnd.nextInt(7)) / 10.0 // 0.1 .. 0.7, never 0
        val l = Seq.fill(22)((rnd.nextInt(8).toLong, arr()))
        val r = Seq.fill(16)((rnd.nextInt(8).toLong, arr()))
        val joined = l.toDF("lid", "la")
          .join(r.toDF("rid", "ra"),
            size(array_intersect(col("la"), col("ra")))
              >= lit(tau) * size(array_union(col("la"), col("ra"))))
          .select("lid", "rid")
        assert(joined.queryExecution.executedPlan.toString
          .contains("graft_elem"), s"must fire (forced=$forced seed=$seed)")
        val got = joined.collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        val want = (for {
          (li, la) <- l; (ri, ra) <- r
          i = la.distinct.count(ra.distinct.contains)
          u = (la ++ ra).distinct.size
          if i.toDouble >= tau * u.toDouble
        } yield (li, ri)).sorted
        assert(got == want,
          s"forced=$forced seed $seed tau=$tau: " +
            s"got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test(">= Jaccard SEMI and ANTI (the rowid-union topology): 12 seeded " +
      "rounds with ~20% empty arrays match the naive evaluation exactly " +
      "— empty left rows survive the semi iff an empty right partner " +
      "passes, and fall out of the anti, duplicate left ids preserved") {
    val sess = spark
    import sess.implicits._
    for (jt <- Seq("left_semi", "left_anti"); seed <- 80 to 85) {
      val rnd = new scala.util.Random(seed)
      def arr() = Seq.fill(rnd.nextInt(5))(rnd.nextInt(10).toLong)
      val tau = (1 + rnd.nextInt(7)) / 10.0
      val l = Seq.fill(22)((rnd.nextInt(8).toLong, arr()))
      val r = Seq.fill(16)((rnd.nextInt(8).toLong, arr()))
      val joined = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
        size(array_intersect(col("la"), col("ra")))
          >= lit(tau) * size(array_union(col("la"), col("ra"))), jt)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_elem") && !plan.contains("Cartesian"),
        s"$jt seed=$seed must fire:\n$plan")
      def matches(la: Seq[Long]): Boolean = r.exists { case (_, ra) =>
        val i = la.distinct.count(ra.distinct.contains)
        val u = (la ++ ra).distinct.size
        i.toDouble >= tau * u.toDouble
      }
      val keep: Seq[Long] => Boolean =
        if (jt == "left_semi") matches else (x => !matches(x))
      val want = l.collect { case (li, la) if keep(la) => li }.sorted
      val got = joined.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      assert(got == want,
        s"$jt seed=$seed tau=$tau: got ${got.size}, want ${want.size}")
    }
  }

  test("LEFT SEMI overlap: 10 seeded rounds (both in-place and forced " +
      "two-phase) match the naive semi evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (forced <- Seq(false, true); seed <- 41 to 45) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val rnd = new scala.util.Random(seed)
        val l = Seq.fill(25)((rnd.nextInt(8).toLong, randArr(rnd)))
        val r = Seq.fill(12)((rnd.nextInt(8).toLong, randArr(rnd)))
        val got = l.toDF("lid", "la")
          .join(r.toDF("rid", "ra"),
            arrays_overlap(col("la"), col("ra")), "left_semi")
          .select("lid").collect().map(_.getLong(0)).toSeq.sorted
        val want = l.collect { case (li, la)
            if r.exists { case (_, ra) =>
              la.exists(x => x != null && ra.contains(x)) } => li }.sorted
        assert(got == want,
          s"forced=$forced seed $seed: got ${got.size}, want ${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("LEFT SEMI threshold and strict-Jaccard spellings (the in-place " +
      "semi's prefix-slice paths): 12 seeded rounds match the naive " +
      "semi evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 80 to 85; jac <- Seq(false, true)) {
      val rnd = new scala.util.Random(seed)
      def arr() = Seq.fill(2 + rnd.nextInt(8))(rnd.nextInt(10).toLong)
      val l = Seq.fill(22)((rnd.nextInt(8).toLong, arr()))
      val r = Seq.fill(14)((rnd.nextInt(8).toLong, arr()))
      val (cond, holds) = if (jac) {
        val tau = rnd.nextInt(7) / 10.0
        (size(array_intersect(col("la"), col("ra")))
            > lit(tau) * size(array_union(col("la"), col("ra"))),
          (la: Seq[Long], ra: Seq[Long]) => {
            val i = la.distinct.count(ra.distinct.contains)
            val u = (la ++ ra).distinct.size
            i.toDouble > tau * u.toDouble
          })
      } else {
        val k = 2 + rnd.nextInt(3)
        (size(array_intersect(col("la"), col("ra"))) >= k,
          (la: Seq[Long], ra: Seq[Long]) =>
            la.distinct.count(ra.contains) >= k)
      }
      val got = l.toDF("lid", "la")
        .join(r.toDF("rid", "ra"), cond, "left_semi")
        .select("lid").collect().map(_.getLong(0)).toSeq.sorted
      val want = l.collect { case (li, la)
          if r.exists { case (_, ra) => holds(la, ra) } => li }.sorted
      assert(got == want,
        s"jac=$jac seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("LEFT ANTI threshold and strict-Jaccard spellings (the " +
      "pair-verify two-phase): 12 seeded rounds match the naive anti " +
      "evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 90 to 95; jac <- Seq(false, true)) {
      val rnd = new scala.util.Random(seed)
      def arr() = Seq.fill(rnd.nextInt(9))(rnd.nextInt(10).toLong)
      val l = Seq.fill(22)((rnd.nextInt(8).toLong, arr()))
      val r = Seq.fill(14)((rnd.nextInt(8).toLong, arr()))
      val (cond, holds) = if (jac) {
        val tau = rnd.nextInt(7) / 10.0
        (size(array_intersect(col("la"), col("ra")))
            > lit(tau) * size(array_union(col("la"), col("ra"))),
          (la: Seq[Long], ra: Seq[Long]) => {
            val i = la.distinct.count(ra.distinct.contains)
            val u = (la ++ ra).distinct.size
            i.toDouble > tau * u.toDouble
          })
      } else {
        val k = 1 + rnd.nextInt(4)
        (size(array_intersect(col("la"), col("ra"))) >= k,
          (la: Seq[Long], ra: Seq[Long]) =>
            la.distinct.count(ra.contains) >= k)
      }
      // half the rounds add a cross-side scalar conjunct, exercising
      // the slim join's substituted cheap-conjunct path
      val extra = seed % 2 == 0
      val fullCond = if (extra) cond && col("lid") =!= col("rid") else cond
      val got = l.toDF("lid", "la")
        .join(r.toDF("rid", "ra"), fullCond, "left_anti")
        .select("lid").collect().map(_.getLong(0)).toSeq.sorted
      val want = l.collect { case (li, la)
          if !r.exists { case (ri, ra) =>
            holds(la, ra) && (!extra || li != ri) } => li }.sorted
      assert(got == want,
        s"jac=$jac seed $seed extra=$extra: " +
          s"got ${got.size}, want ${want.size}")
    }
  }

  test("LEFT ANTI membership with the array on the left: 10 seeded " +
      "rounds (nulls, empties, duplicate rows) match the naive anti " +
      "evaluation exactly") {
    val sess = spark
    import sess.implicits._
    for (seed <- 100 to 109) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.fill(22)((rnd.nextInt(8).toLong, randArr(rnd)))
      val r = Seq.fill(10)((rnd.nextInt(8).toLong,
        if (rnd.nextInt(100) < 20) null else pool(rnd.nextInt(pool.size))))
      val got = l.toDF("lid", "tags")
        .join(r.toDF("rid", "tag"),
          array_contains(col("tags"), col("tag")), "left_anti")
        .select("lid").collect().map(_.getLong(0)).toSeq.sorted
      val want = l.collect { case (li, la)
          if !r.exists { case (_, tg) =>
            tg != null && la.exists(e => e != null && e == tg) } => li }
        .sorted
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }
}
