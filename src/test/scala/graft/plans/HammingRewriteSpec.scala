package graft.plans

import graft.SparkSuite
import graft.functions.GraftFunctions.hamming64
import org.apache.spark.sql.functions._

/** HammingBlockJoinRewrite: a naive cross join filtered on
  * hamming64(a,b) ≤ k plans as ONE posexplode block equi-join (no
  * nested-loop/cartesian, no union, each input scanned once), produces
  * EXACTLY the rows of the naive evaluation (JVM-side ground truth),
  * preserves duplicate-row multiplicity, and stands down when disabled
  * or when an equi-join already links the sides. */
class HammingRewriteSpec extends SparkSuite {

  private def codes(seed: Long, n: Int) = {
    val sess = spark
    import sess.implicits._
    // deterministic pseudo-random 64-bit codes (splitmix64 finalizer)
    (0 until n).map { i =>
      var z = seed + 0x9E3779B97F4A7C15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (i.toLong, z ^ (z >>> 31))
    }
  }

  test("rewrite fires: no nested-loop join in the plan, result multiset " +
      "identical to JVM ground truth, duplicates preserved") {
    val sess = spark
    import sess.implicits._
    val k = 3
    val base = codes(42L, 120)
    // plant near-dups: for every 10th code, a copy with 2 bits flipped
    // (within k) and one with 8 bits flipped (outside k); plus one exact
    // DUPLICATE left row to prove multiplicity survives
    val left = (base ++ Seq(base.head)).toDF("lid", "lcode")
    val rightRows = base.filter(_._1 % 10 == 0).flatMap { case (i, c) =>
      Seq((i + 1000L, c ^ 5L), (i + 2000L, c ^ 0xFF00000000L))
    }
    val right = rightRows.toDF("rid", "rcode")
    val joined = left.crossJoin(right)
      .filter(hamming64(col("lcode"), col("rcode")) <= k)
      .select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rewrite did not fire:\n$plan")
    // self-contained single-join shape: no union of branches, one
    // posexplode per side, each input scanned exactly once
    assert(!plan.contains("Union"), s"expected single block join:\n$plan")
    assert(plan.contains("graft_bidx"), s"expected posexplode blocks:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 2, s"each side must be scanned once, saw $scans:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    val want = (for {
      (li, lc) <- base ++ Seq(base.head)
      (ri, rc) <- rightRows
      if java.lang.Long.bitCount(lc ^ rc) <= k
    } yield (li, ri)).sorted
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got == want, s"rows differ: got ${got.size}, want ${want.size}")
    // the duplicated left row must appear twice
    val dupMatches = want.count(_._1 == base.head._1)
    assert(got.count(_._1 == base.head._1) == dupMatches)
  }

  test("rewrite stands down when disabled by conf and when an equi-join " +
      "already links the sides") {
    val sess = spark
    import sess.implicits._
    val left = codes(7L, 30).toDF("lid", "lcode")
    val right = codes(7L, 30).map { case (i, c) => (i, c ^ 1L) }
      .toDF("rid", "rcode")
    spark.conf.set(ScaleGuards.HammingBlockJoinRewriteKey, "false")
    try {
      val off = left.crossJoin(right)
        .filter(hamming64(col("lcode"), col("rcode")) <= 2)
      assert(!off.queryExecution.executedPlan.toString.contains("graft_bidx"))
      // rows still correct without the rewrite (30 pairs differ by 1 bit)
      assert(off.count() == 30)
    } finally spark.conf.unset(ScaleGuards.HammingBlockJoinRewriteKey)
    // equi-join already present → no rewrite, plan is the plain equi-join
    val equi = left.join(right, col("lid") === col("rid")
      && hamming64(col("lcode"), col("rcode")) <= 2)
    assert(!equi.queryExecution.executedPlan.toString.contains("graft_bidx"))
    assert(equi.count() == 30)
  }

  test("LEFT SEMI hamming: the fingerprint-decontamination shape fires " +
      "(no nested loop), matches the naive semi evaluation, preserves " +
      "duplicate left rows, in BOTH the in-place and forced two-phase " +
      "topologies") {
    val sess = spark
    import sess.implicits._
    val k = 3
    val base = codes(11L, 100)
    // duplicate left row to prove multiplicity; banned = some codes
    // within k of every 7th left code, some far away
    val leftRows = base ++ Seq(base.head)
    val left = leftRows.toDF("lid", "lcode")
    val bannedRows = base.filter(_._1 % 7 == 0).flatMap { case (i, c) =>
      Seq((i + 500L, c ^ 3L), (i + 900L, c ^ 0xF0F0F0F0L))
    }
    val banned = bannedRows.toDF("bid", "bcode")
    val want = leftRows.collect {
      case (li, lc) if bannedRows.exists { case (_, bc) =>
        java.lang.Long.bitCount(lc ^ bc) <= k } => li
    }.sorted
    assert(want.nonEmpty && want.count(_ == 0L) == 2, "fixture self-check")
    for (forced <- Seq(false, true)) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val semi = left.join(banned,
          hamming64(col("lcode"), col("bcode")) <= k, "left_semi")
        val plan = semi.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"semi rewrite did not fire (forced=$forced):\n$plan")
        assert(plan.contains("graft_bidx"),
          s"expected posexplode blocks (forced=$forced):\n$plan")
        val got = semi.select("lid").collect().map(_.getLong(0)).toSeq.sorted
        assert(got == want, s"forced=$forced: got=${got.size} want=${want.size}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("SQL NOT EXISTS hamming scrub fires via the post-subquery " +
      "registration: the anti join only exists after RewriteSubquery, " +
      "so the late extraOptimizations pass must carry it") {
    val sess = spark
    import sess.implicits._
    val k = 3
    val base = codes(11L, 60)
    base.toDF("lid", "lcode").createOrReplaceTempView("hx_corpus")
    base.filter(_._1 % 7 == 0)
      .map { case (i, c) => (i + 500L, c ^ 3L) }
      .toDF("bid", "bcode").createOrReplaceTempView("hx_banned")
    val q = spark.sql(
      s"""SELECT lid FROM hx_corpus c WHERE NOT EXISTS (
         |  SELECT 1 FROM hx_banned b
         |  WHERE bit_count(c.lcode ^ b.bcode) <= $k)""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"NOT EXISTS anti rewrite did not fire:\n$plan")
    assert(plan.contains("graft_bidx"), s"posexplode blocks expected:\n$plan")
    val want = base.collect {
      case (li, lc) if !base.filter(_._1 % 7 == 0).exists { case (_, c) =>
        java.lang.Long.bitCount(lc ^ (c ^ 3L)) <= k } => li
    }.sorted
    assert(want.nonEmpty && want.size < base.size, "fixture self-check")
    val got = q.collect().map(_.getLong(0)).toSeq.sorted
    assert(got == want, s"got=${got.size} want=${want.size}")
  }

  test("in-place semi collapse preserves payload float bits (-0.0 stays " +
      "-0.0) and accepts map-typed payload columns") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, 0x0FL, -0.0, Map("m" -> 1)),
      (2L, 0xFF00FF00L, 2.5, Map("m" -> 2)))
      .toDF("lid", "lcode", "score", "meta")
    val banned = Seq((9L, 0x0EL)).toDF("bid", "bcode")
    val semi = left.join(banned,
      hamming64(col("lcode"), col("bcode")) <= 2, "left_semi")
    val plan = semi.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"map payload must no longer stand down:\n$plan")
    assert(plan.contains("graft_bidx"), plan)
    val rows = semi.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L, rows.mkString(","))
    assert(java.lang.Double.doubleToRawLongBits(rows(0).getDouble(2))
      == java.lang.Double.doubleToRawLongBits(-0.0),
      "payload -0.0 must survive the collapse bit-exact")
    assert(rows(0).getMap[String, Int](3).toMap == Map("m" -> 1))
  }

  test("builtin bit_count(a ^ b) spelling — a pure-SQL query with no " +
      "graft import — fires the rewrite and matches ground truth for " +
      "inner, semi, and anti") {
    val sess = spark
    import sess.implicits._
    val k = 3
    val base = codes(55L, 60)
    val left = base.toDF("lid", "lcode")
    val right = base.filter(_._1 % 4 == 0)
      .map { case (i, c) => (i + 900L, c ^ 5L) }.toDF("rid", "rcode")
    val rightRows = base.filter(_._1 % 4 == 0)
      .map { case (i, c) => (i + 900L, c ^ 5L) }
    val inner = left.join(right,
        expr(s"bit_count(lcode ^ rcode) <= $k"))
      .select("lid", "rid")
    val planI = inner.queryExecution.executedPlan.toString
    assert(!planI.contains("NestedLoop") && !planI.contains("Cartesian"),
      s"builtin spelling must fire:\n$planI")
    assert(planI.contains("graft_bidx"), s"posexplode blocks:\n$planI")
    val wantI = (for {
      (li, lc) <- base; (ri, rc) <- rightRows
      if java.lang.Long.bitCount(lc ^ rc) <= k
    } yield (li, ri)).sorted
    assert(wantI.nonEmpty, "fixture must produce matches")
    assert(inner.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted == wantI)
    for (jt <- Seq("left_semi", "left_anti")) {
      val j = left.join(right, expr(s"bit_count(lcode ^ rcode) <= $k"), jt)
        .select("lid")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"$jt builtin spelling must fire:\n$p")
      val matches = base.collect { case (li, lc)
          if rightRows.exists { case (_, rc) =>
            java.lang.Long.bitCount(lc ^ rc) <= k } => li }.sorted
      val want = if (jt == "left_semi") matches
        else base.map(_._1).sorted.diff(matches)
      assert(j.collect().map(_.getLong(0)).toSeq.sorted == want,
        s"$jt ground truth")
    }
  }

  test("INNER two-phase (wide payload + forced floor): a string column " +
      "in the join output routes the rewrite through the slim pair-list " +
      "(graft_prid in the plan) and the result multiset is identical to " +
      "ground truth, duplicates preserved; all-fixed-width payloads " +
      "keep the in-place posexplode shape") {
    val sess = spark
    import sess.implicits._
    val k = 2
    val base = codes(99L, 80)
    val leftRows = (base ++ Seq(base.head))
      .map { case (i, c) => (i, c, s"payload-$i") }
    val left = leftRows.toDF("lid", "lcode", "ltext")
    val rightRows = base.filter(_._1 % 5 == 0)
      .map { case (i, c) => (i + 700L, c ^ 3L) }
    val right = rightRows.toDF("rid", "rcode")
    val want = (for {
      (li, lc, _) <- leftRows
      (ri, rc) <- rightRows
      if java.lang.Long.bitCount(lc ^ rc) <= k
    } yield (li, ri)).sorted
    assert(want.nonEmpty, "fixture must produce matches")
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      val joined = left.join(right,
          graft.functions.GraftFunctions.hamming64(
            col("lcode"), col("rcode")) <= k)
        .select("lid", "rid", "ltext")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
      assert(plan.contains("graft_prid"),
        s"wide payload must take the two-phase pair-list:\n$plan")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == want, s"two-phase inner identity broke: " +
        s"got=${got.size} want=${want.size}")
      // all-fixed-width payload (drop the string): in-place shape stays
      val slim = left.select("lid", "lcode").join(right,
          graft.functions.GraftFunctions.hamming64(
            col("lcode"), col("rcode")) <= k)
        .select("lid", "rid")
      val slimPlan = slim.queryExecution.executedPlan.toString
      assert(!slimPlan.contains("graft_prid"),
        s"fixed-width rows must keep the in-place posexplode:\n$slimPlan")
      assert(slim.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted == want)
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }
}
