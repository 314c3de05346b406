package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SetOverlapJoinRewrite: a naive join on arrays_overlap(a, b) plans as
  * one exploded element equi-join (no nested-loop/cartesian, each input
  * scanned once), produces EXACTLY the rows of the naive evaluation —
  * null elements, duplicate elements, empty arrays, and duplicate rows
  * included — and stands down when disabled or when an equi-join
  * already links the sides. */
class OverlapRewriteSpec extends SparkSuite {

  // fixture exercising every identity edge: shared elements (several per
  // pair), duplicate elements WITHIN arrays, null elements, null-only
  // potential overlap, empty arrays, and a duplicated left row
  private def fixtures = {
    val left = Seq(
      (1L, Seq[String]("a", "b", "c")),
      (2L, Seq[String]("b", "b", "d")), // duplicate element in-array
      (3L, Seq[String](null, "e")), // null before the shared element
      (4L, Seq[String](null)), // null-only: never overlaps
      (5L, Seq[String]()), // empty: never overlaps
      (6L, Seq[String]("zz")),
      (1L, Seq[String]("a", "b", "c"))) // duplicated row: multiplicity
    val right = Seq(
      (10L, Seq[String]("c", "b")), // two shared elements with lid 1
      (11L, Seq[String]("d", null)), // null after the shared element
      (12L, Seq[String](null, "x")), // null-only vs lid 3/4
      (13L, Seq[String]()),
      (14L, Seq[String]("e", "e"))) // duplicate element in-array
    (left, right)
  }

  /** JVM ground truth of arrays_overlap join semantics: TRUE iff a
    * non-null element is shared. */
  private def naive(left: Seq[(Long, Seq[String])],
      right: Seq[(Long, Seq[String])]): Seq[(Long, Long)] =
    (for {
      (li, la) <- left
      (ri, ra) <- right
      if la.exists(x => x != null && ra.contains(x))
    } yield (li, ri)).sorted

  test("rewrite fires: no nested-loop join, exploded equi-join, single " +
      "scan per side, result multiset identical to ground truth with " +
      "nulls/duplicates/empties, duplicate rows preserved") {
    val sess = spark
    import sess.implicits._
    val (l, r) = fixtures
    val left = l.toDF("lid", "la")
    val right = r.toDF("rid", "ra")
    val joined = left.join(right, arrays_overlap(col("la"), col("ra")))
      .select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rewrite did not fire:\n$plan")
    assert(plan.contains("graft_elem"), s"expected exploded elements:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 2, s"each side must be scanned once, saw $scans:\n$plan")
    val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted
    val want = naive(l, r)
    assert(want.nonEmpty, "fixture must produce matches")
    // lid 1 appears twice in the input → its matches appear twice
    assert(want.count(_ == (1L, 10L)) == 2, "fixture self-check")
    assert(got == want,
      s"rows differ:\n got=${got.mkString(",")}\nwant=${want.mkString(",")}")
  }

  test("intersect-size threshold spelling fires on null-free arrays and " +
      "applies the threshold exactly") {
    val sess = spark
    import sess.implicits._
    // toDF on Seq[Long] arrays yields containsNull=false element types
    val left = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 99L)))
      .toDF("lid", "la")
    val right = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L)))
      .toDF("rid", "ra")
    val joined = left.join(right,
        size(array_intersect(col("la"), col("ra"))) >= 2)
      .select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rewrite did not fire:\n$plan")
    // only (1, 7) shares two elements; single-element overlaps fail the
    // re-applied threshold
    assert(joined.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      == Seq((1L, 7L)))
  }

  test("membership spelling: array_contains(a, x) across sides explodes " +
      "only the array side, matches the naive evaluation with nulls and " +
      "duplicate elements, and emits each pair once") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, Seq[String]("red", "blue", "blue")), // duplicate element
      (2L, Seq[String](null, "green")), // null before the match
      (3L, Seq[String]()),
      (4L, Seq[String]("red")),
      (1L, Seq[String]("red", "blue", "blue"))) // duplicated row
      .toDF("lid", "tags")
    val right = Seq((10L, "blue"), (11L, "green"), (12L, null: String),
      (13L, "absent")).toDF("rid", "tag")
    val joined = left.join(right, array_contains(col("tags"), col("tag")))
      .select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"membership rewrite did not fire:\n$plan")
    assert(plan.contains("graft_member_elem"), s"expected explode:\n$plan")
    val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted
    // ground truth: pairs where a non-null tag equals a non-null probe
    val want = Seq((1L, 10L), (1L, 10L), (2L, 11L)).sorted
    assert(got == want, s"got=$got want=$want")
  }

  test("membership spelling with the scalar on the LEFT side explodes " +
      "the right-side array") {
    val sess = spark
    import sess.implicits._
    val probes = Seq((1L, "b"), (2L, "z")).toDF("pid", "p")
    val arrs = Seq((10L, Seq("a", "b")), (11L, Seq("b", "c")))
      .toDF("aid", "arr")
    val joined = probes.join(arrs, array_contains(col("arr"), col("p")))
      .select("pid", "aid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_member_elem") && !plan.contains("NestedLoop"))
    assert(joined.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      .sorted == Seq((1L, 10L), (1L, 11L)))
  }

  test("TWO-PHASE topology (forced via twoPhaseMinBytes=0): identical " +
      "multiset to ground truth on the null/duplicate/empty fixture, " +
      "pair-list shape in the plan, and the threshold spelling still " +
      "re-applies its predicate raw") {
    val sess = spark
    import sess.implicits._
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      val (l, r) = fixtures
      val joined = l.toDF("lid", "la")
        .join(r.toDF("rid", "ra"), arrays_overlap(col("la"), col("ra")))
        .select("lid", "rid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_prid"),
        s"two-phase pair-list shape must fire when forced:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
      val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSeq.sorted
      assert(got == naive(l, r), s"two-phase identity broke: got=$got")
      assert(got.count(_ == (1L, 10L)) == 2, "duplicate-row multiplicity")
      // threshold spelling under two-phase: raw re-application exact
      val lt = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 99L)))
        .toDF("lid", "la")
      val rt = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L)))
        .toDF("rid", "ra")
      val th = lt.join(rt, size(array_intersect(col("la"), col("ra"))) >= 2)
        .select("lid", "rid")
      assert(th.queryExecution.executedPlan.toString.contains("graft_prid"))
      assert(th.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
        == Seq((1L, 7L)))
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  /** JVM ground truth of the LeftSemi overlap join. */
  private def naiveSemi(left: Seq[(Long, Seq[String])],
      right: Seq[(Long, Seq[String])]): Seq[Long] =
    left.collect {
      case (li, la)
          if right.exists { case (_, ra) =>
            la.exists(x => x != null && ra.contains(x)) } => li
    }.sorted

  test("LEFT SEMI overlap: rewrite fires (no nested loop), matches the " +
      "naive semi evaluation with nulls/duplicates/empties, preserves " +
      "duplicate left rows, in BOTH the in-place and forced two-phase " +
      "topologies") {
    val sess = spark
    import sess.implicits._
    val (l, r) = fixtures
    val left = l.toDF("lid", "la")
    val right = r.toDF("rid", "ra")
    val want = naiveSemi(l, r)
    assert(want.count(_ == 1L) == 2, "duplicated lid 1 must survive twice")
    for (forced <- Seq(false, true)) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val semi = left.join(right,
          arrays_overlap(col("la"), col("ra")), "left_semi")
        val plan = semi.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"semi rewrite did not fire (forced=$forced):\n$plan")
        assert(plan.contains("graft_"),
          s"expected rewrite artifacts (forced=$forced):\n$plan")
        val got = semi.select("lid").collect().map(_.getLong(0)).toSeq.sorted
        assert(got == want, s"forced=$forced: got=$got want=$want")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
  }

  test("LEFT SEMI membership: array on the right keeps the probe side " +
      "unexploded; array on the left collapses back to one row per " +
      "input row — both match naive semi semantics") {
    val sess = spark
    import sess.implicits._
    // array on the RIGHT: probe ⋉ tag-sets
    val probes = Seq((1L, "b"), (2L, "z"), (3L, null: String), (1L, "b"))
      .toDF("pid", "p")
    val arrs = Seq((10L, Seq("a", "b")), (11L, Seq("b", "c")))
      .toDF("aid", "arr")
    val semiR = probes.join(arrs, array_contains(col("arr"), col("p")),
      "left_semi")
    val planR = semiR.queryExecution.executedPlan.toString
    assert(planR.contains("graft_member_elem") && !planR.contains("NestedLoop"))
    assert(semiR.select("pid").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(1L, 1L), "duplicate probe rows preserved, null probe dropped")
    // array on the LEFT: docs ⋉ banned tokens
    val docs = Seq(
      (1L, Seq[String]("red", "blue", "blue")),
      (2L, Seq[String](null, "green")),
      (3L, Seq[String]()),
      (1L, Seq[String]("red", "blue", "blue"))).toDF("did", "tags")
    val banned = Seq(Tuple1("blue"), Tuple1("absent")).toDF("tag")
    val semiL = docs.join(banned, array_contains(col("tags"), col("tag")),
      "left_semi")
    val planL = semiL.queryExecution.executedPlan.toString
    assert(planL.contains("graft_member_elem") && !planL.contains("NestedLoop"))
    assert(semiL.select("did").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(1L, 1L))
  }

  test("a plan_fence'd filter under the join does NOT stand the two-phase " +
      "rewrites down: the fence is a pure identity, so the rowid stays " +
      "order-stable (anti has no fallback — a stand-down here would run " +
      "the naive nested-loop at scale)") {
    val sess = spark
    import sess.implicits._
    import graft.functions.PlanFence.fence
    val left = Seq(
      (1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq("x")))
      .toDF("lid", "la")
      .filter(fence(size(col("la")) >= 1))
    val right = Seq((10L, Seq("a")), (11L, Seq("c"))).toDF("rid", "ra")
    val anti = left.join(right,
      arrays_overlap(col("la"), col("ra")), "left_anti")
    val plan = anti.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"anti rewrite must fire through the fence:\n$plan")
    assert(plan.contains("graft_rid"),
      s"two-phase stable-rowid shape expected:\n$plan")
    assert(anti.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(3L))
  }

  test("in-place semi collapse preserves payload float bits (-0.0 stays " +
      "-0.0 — the srid-only group keeps payloads off the normalized " +
      "grouping keys) and accepts map-typed payload columns") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, -0.0, Map("k" -> 1), Seq("a", "b")),
      (2L, 1.5, Map("k" -> 2), Seq("zz")))
      .toDF("lid", "score", "meta", "la")
    val right = Seq((10L, Seq("b"))).toDF("rid", "ra")
    // overlap spelling (inPlaceSemi)
    val semi = left.join(right,
      arrays_overlap(col("la"), col("ra")), "left_semi")
    val plan = semi.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"map payload must no longer stand down:\n$plan")
    assert(plan.contains("graft_"), plan)
    val rows = semi.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L, rows.mkString(","))
    val bits = java.lang.Double.doubleToRawLongBits(rows(0).getDouble(1))
    assert(bits == java.lang.Double.doubleToRawLongBits(-0.0),
      s"payload -0.0 must survive the collapse bit-exact, got bits=$bits")
    assert(rows(0).getMap[String, Int](2).toMap == Map("k" -> 1))
    // membership spelling, array on the left (its own in-place collapse)
    val banned = Seq(Tuple1("a")).toDF("tag")
    val semiM = left.join(banned,
      array_contains(col("la"), col("tag")), "left_semi")
    val planM = semiM.queryExecution.executedPlan.toString
    assert(planM.contains("graft_member_elem")
      && !planM.contains("NestedLoop"), planM)
    val rowsM = semiM.collect()
    assert(rowsM.length == 1 && rowsM(0).getLong(0) == 1L)
    assert(java.lang.Double.doubleToRawLongBits(rowsM(0).getDouble(1))
      == java.lang.Double.doubleToRawLongBits(-0.0),
      "membership collapse must also keep -0.0 bit-exact")
    assert(rowsM(0).getMap[String, Int](2).toMap == Map("k" -> 1))
  }

  test("strict-Jaccard spelling: size(intersect) > tau * size(union) " +
      "fires (both topologies), applies the exact double-arithmetic " +
      "boundary, preserves duplicate-row multiplicity") {
    val sess = spark
    import sess.implicits._
    // J(1,7) = 2/4 = 0.5; J(2,8) = 1/3; J(3,9) = 3/3 = 1.0; (4,_) empty
    val l = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 99L)),
      (3L, Seq(7L, 8L, 9L)), (4L, Seq[Long]()),
      (3L, Seq(7L, 8L, 9L))) // duplicated row: multiplicity
    val r = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L)),
      (9L, Seq(7L, 8L, 9L)), (5L, Seq[Long]()))
    def naiveJac(tau: Double): Seq[(Long, Long)] = (for {
      (li, la) <- l; (ri, ra) <- r
      i = la.distinct.count(ra.distinct.contains)
      u = (la ++ ra).distinct.size
      if i.toDouble > tau * u.toDouble
    } yield (li, ri)).sorted
    for (forced <- Seq(false, true); tau <- Seq(0.3, 0.5, 0.0)) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val joined = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
            size(array_intersect(col("la"), col("ra")))
              > lit(tau) * size(array_union(col("la"), col("ra"))))
          .select("lid", "rid")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"jaccard rewrite did not fire (forced=$forced tau=$tau):\n$plan")
        assert(plan.contains("graft_elem"), s"expected explode:\n$plan")
        val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
          .toSeq.sorted
        assert(got == naiveJac(tau),
          s"forced=$forced tau=$tau: got=$got want=${naiveJac(tau)}")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
    // tau = 0.5: J(1,7) = 0.5 exactly — strict > must EXCLUDE it
    assert(!naiveJac(0.5).contains((1L, 7L)), "boundary self-check")
  }

  test(">= Jaccard spelling: fires as witnessed-union-empty-cross " +
      "(both topologies) — the empty-empty pairs strict > never emits " +
      "ARE in the result, the >= boundary includes the exact-tau pair, " +
      "duplicate rows preserved; tau = 0 stands down (TRUE for every " +
      "pair); semi and anti fire via the rowid union") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 99L)),
      (3L, Seq(7L, 8L, 9L)), (4L, Seq[Long]()),
      (3L, Seq(7L, 8L, 9L)), (6L, Seq[Long]())) // two empty left rows
    val r = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L)),
      (9L, Seq(7L, 8L, 9L)), (5L, Seq[Long]()))
    def naiveGe(tau: Double): Seq[(Long, Long)] = (for {
      (li, la) <- l; (ri, ra) <- r
      i = la.distinct.count(ra.distinct.contains)
      u = (la ++ ra).distinct.size
      if i.toDouble >= tau * u.toDouble
    } yield (li, ri)).sorted
    for (forced <- Seq(false, true); tau <- Seq(0.3, 0.5)) {
      if (forced) spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
      try {
        val joined = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
            size(array_intersect(col("la"), col("ra")))
              >= lit(tau) * size(array_union(col("la"), col("ra"))))
          .select("lid", "rid")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("graft_elem"),
          s"witnessed branch must fire (forced=$forced tau=$tau):\n$plan")
        assert(!plan.contains("CartesianProduct"),
          s"empty cross must broadcast, never cartesian:\n$plan")
        val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
          .toSeq.sorted
        val want = naiveGe(tau)
        // the fixture exercises both branches: empty-empty pairs
        // (4,5)/(6,5) and the exact-boundary witnessed pair (1,7)
        assert(want.contains((4L, 5L)) && want.contains((6L, 5L))
          && want.contains((1L, 7L)), "fixture self-check")
        assert(got == want,
          s"forced=$forced tau=$tau: got=$got want=$want")
      } finally
        if (forced) spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
    }
    // tau = 0: >= is TRUE for every pair — a genuine cross, stands down
    val ge0 = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
      size(array_intersect(col("la"), col("ra")))
        >= lit(0.0) * size(array_union(col("la"), col("ra"))))
    assert(!ge0.queryExecution.executedPlan.toString.contains("graft_elem"),
      ">= with tau = 0 must stand down")
    assert(ge0.count() == l.size.toLong * r.size, "and still answer")
    // semi/anti (round 10): the matched-rowid set is witnessed rowids
    // UNION empty-matched rowids, so empty left rows survive the semi
    // (they match the empty right row) and fall out of the anti —
    // exactly the naive answers, duplicate left rows preserved
    // tau = 0.5: lid 2 matches nothing (1/3 < 0.5) and survives the
    // anti; empties match the empty right row and survive the semi
    val matchedIds = naiveGe(0.5).map(_._1).distinct.toSet
    assert(!matchedIds.contains(2L) && matchedIds.contains(4L),
      "fixture self-check: anti and empty-semi both non-trivial")
    for (jt <- Seq("left_semi", "left_anti")) {
      val ge = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
        size(array_intersect(col("la"), col("ra")))
          >= lit(0.5) * size(array_union(col("la"), col("ra"))), jt)
      val plan = ge.queryExecution.executedPlan.toString
      assert(plan.contains("graft_elem"),
        s">= $jt must fire via the rowid union:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
      val keep: Long => Boolean =
        if (jt == "left_semi") matchedIds.contains else !matchedIds.contains(_)
      val want = l.map(_._1).filter(keep).sorted
      assert(want.nonEmpty, s"fixture self-check ($jt)")
      val got = ge.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      assert(got == want, s"$jt: got=$got want=$want")
    }
  }

  test("prefix slice at threshold c >= 2: the exploded element count " +
      "drops to (size - c + 1) per row while the result stays exact — " +
      "counted via the rewritten plan's generator output on a row " +
      "whose matching element sorts LAST (the lemma's worst case)") {
    val sess = spark
    import sess.implicits._
    // shared elements {8, 9} sort at the END of both arrays: a prefix
    // bug that sliced the wrong end would lose the pair
    val l = Seq((1L, Seq(1L, 2L, 3L, 8L, 9L))).toDF("lid", "la")
    val r = Seq((7L, Seq(4L, 5L, 6L, 8L, 9L))).toDF("rid", "ra")
    val joined = l.join(r,
        size(array_intersect(col("la"), col("ra"))) >= 2)
      .select("lid", "rid")
    assert(joined.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      == Seq((1L, 7L)), "worst-case-ordered pair must survive the slice")
    // c = 3 demands three shared elements: the pair must now vanish,
    // and the prefix (5 - 3 + 1 = 3 elements) must still be complete
    // for a qualifying triple-overlap pair
    val none = l.join(r,
        size(array_intersect(col("la"), col("ra"))) >= 3)
    assert(none.count() == 0)
    val r3 = Seq((8L, Seq(3L, 8L, 9L, 10L))).toDF("rid", "ra")
    val three = l.join(r3,
        size(array_intersect(col("la"), col("ra"))) >= 3)
      .select("lid", "rid")
    assert(three.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      == Seq((1L, 8L)))
  }

  test("STRING-element prefix slices sort in HASH order (the struct " +
      "(xxhash64, elem) total order), and the two-phase result still " +
      "matches the naive evaluation exactly — including pairs whose " +
      "witness sorts first naturally but last by hash and vice versa") {
    val sess = spark
    import sess.implicits._
    // 40 docs of 6 distinct tokens drawn from a 12-token pool: across
    // seeds some qualifying pair's witness lands at every position of
    // the hash order, so a wrong-end slice or a side-inconsistent order
    // loses pairs (multiset compare catches it)
    val pool = ('a' to 'l').map(c => s"tok_$c$c$c")
    val rnd = new scala.util.Random(4242)
    val docs = (1L to 40L).map(i =>
      (i, rnd.shuffle(pool).take(6).map(_.toString)))
    // encoders declare string array elements nullable; the threshold
    // recognizer's static null-free gate needs containsNull=false, so
    // rebuild the element type through a never-null transform
    def nn(df: org.apache.spark.sql.DataFrame, arr: String) =
      df.withColumn(arr, expr(s"transform($arr, x -> coalesce(x, 'z'))"))
    val l = nn(docs.toDF("lid", "la"), "la")
    val r = nn(docs.map { case (i, a) => (i + 100L, a) }.toDF("rid", "ra"),
      "ra")
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
    val joined = l.join(r,
        size(array_intersect(col("la"), col("ra"))) >= lit(4)
          && col("lid") =!= col("rid") - 100L)
      .select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_elem"), s"two-phase must fire:\n$plan")
    assert(plan.contains("named_struct"),
      "string elements must take the hash-order prefix (struct sort), " +
        s"not the raw string sort:\n$plan")
    val got = joined.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted
    val want = (for {
      (li, la) <- docs; (ri, ra) <- docs
      if li != ri && la.count(ra.contains) >= 4
    } yield (li, ri + 100L)).sorted
    assert(want.nonEmpty, "fixture self-check: some pairs must qualify")
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  test("LEFT ANTI threshold and strict-Jaccard spellings (the " +
      "pair-verify two-phase): keep-the-clean-corpus fires with no " +
      "nested loop and matches the naive anti evaluation, duplicate " +
      "left rows preserved; semi twin matches too") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Seq(10L, 20L, 30L, 40L)), (2L, Seq(10L, 99L)),
      (3L, Seq(7L, 8L)), (4L, Seq[Long]()),
      (1L, Seq(10L, 20L, 30L, 40L))) // duplicated row
    val r = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L)))
    def naiveMatches(la: Seq[Long]): Boolean =
      r.exists { case (_, ra) => la.distinct.count(ra.contains) >= 3 }
    val wantAnti = l.collect {
      case (li, la) if !naiveMatches(la) => li }.sorted
    val wantSemi = l.collect {
      case (li, la) if naiveMatches(la) => li }.sorted
    assert(wantSemi == Seq(1L, 1L) && wantAnti == Seq(2L, 3L, 4L),
      "fixture self-check")
    for (jt <- Seq("left_anti", "left_semi")) {
      val joined = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
          size(array_intersect(col("la"), col("ra"))) >= 3, jt)
        .select("lid")
      val plan = joined.queryExecution.executedPlan.toString
      if (jt == "left_anti") {
        // anti always two-phases (no in-place form exists)
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"anti threshold must not stay a nested loop:\n$plan")
        assert(plan.contains("graft_prid"), s"pair-verify shape:\n$plan")
      }
      val got = joined.collect().map(_.getLong(0)).toSeq.sorted
      val want = if (jt == "left_anti") wantAnti else wantSemi
      assert(got == want, s"$jt: got=$got want=$want")
    }
    // strict-Jaccard anti under the forced floor
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      val jac = l.toDF("lid", "la").join(r.toDF("rid", "ra"),
          size(array_intersect(col("la"), col("ra")))
            > lit(0.5) * size(array_union(col("la"), col("ra"))),
          "left_anti")
        .select("lid")
      val plan = jac.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"jaccard anti must two-phase:\n$plan")
      def jacMatch(la: Seq[Long]): Boolean = r.exists { case (_, ra) =>
        val i = la.distinct.count(ra.distinct.contains)
        val u = (la ++ ra).distinct.size
        i.toDouble > 0.5 * u.toDouble
      }
      val want = l.collect { case (li, la) if !jacMatch(la) => li }.sorted
      assert(jac.collect().map(_.getLong(0)).toSeq.sorted == want)
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  test("LEFT ANTI membership with the array on the LEFT (keep docs " +
      "with no banned tag): two-phases with no nested loop, matches " +
      "naive anti semantics with nulls/duplicates/empties") {
    val sess = spark
    import sess.implicits._
    val l = Seq(
      (1L, Seq[String]("red", "blue", "blue")),
      (2L, Seq[String](null, "green")),
      (3L, Seq[String]()), // no tags: never contains → survives anti
      (4L, Seq[String]("red")),
      (1L, Seq[String]("red", "blue", "blue"))) // duplicated row
    val r = Seq((10L, "blue"), (12L, null: String))
    val joined = l.toDF("lid", "tags")
      .join(r.toDF("rid", "tag"),
        array_contains(col("tags"), col("tag")), "left_anti")
      .select("lid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"anti membership must not stay a nested loop:\n$plan")
    assert(plan.contains("graft_member_elem"), s"explode shape:\n$plan")
    val want = l.collect { case (li, la)
        if !r.exists { case (_, tg) =>
          tg != null && la.exists(e => e != null && e == tg) } => li }.sorted
    assert(want == Seq(2L, 3L, 4L), "fixture self-check")
    assert(joined.collect().map(_.getLong(0)).toSeq.sorted == want)
    // semi twin under the forced floor takes the same two-phase path
    spark.conf.set(ScaleGuards.OverlapTwoPhaseMinBytesKey, "0")
    try {
      val semi = l.toDF("lid", "tags")
        .join(r.toDF("rid", "tag"),
          array_contains(col("tags"), col("tag")), "left_semi")
        .select("lid")
      assert(semi.queryExecution.executedPlan.toString.contains("graft_prid"))
      assert(semi.collect().map(_.getLong(0)).toSeq.sorted == Seq(1L, 1L))
    } finally spark.conf.unset(ScaleGuards.OverlapTwoPhaseMinBytesKey)
  }

  test("HOF spelling `exists(a, e -> array_contains(b, e))` — the " +
      "pure-SQL phrasing of overlap — fires the rewrite and matches " +
      "the naive evaluation for inner, semi, and anti, nulls and " +
      "duplicates included") {
    val sess = spark
    import sess.implicits._
    val (l, r) = fixtures
    val left = l.toDF("lid", "la")
    val right = r.toDF("rid", "ra")
    val cond = expr("exists(la, e -> array_contains(ra, e))")
    val inner = left.join(right, cond).select("lid", "rid")
    val planI = inner.queryExecution.executedPlan.toString
    assert(!planI.contains("NestedLoop") && !planI.contains("Cartesian"),
      s"exists spelling must fire:\n$planI")
    assert(planI.contains("graft_elem"), s"exploded elements:\n$planI")
    assert(inner.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted == naive(l, r))
    val semi = left.join(right, cond, "left_semi").select("lid")
    assert(!semi.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(semi.collect().map(_.getLong(0)).toSeq.sorted == naiveSemi(l, r))
    val anti = left.join(right, cond, "left_anti").select("lid")
    assert(!anti.queryExecution.executedPlan.toString.contains("NestedLoop"))
    // multiset diff: duplicate left rows stay duplicated on whichever
    // side of the semi/anti split they fall
    val wantAnti = l.map(_._1).sorted.diff(naiveSemi(l, r))
    assert(anti.collect().map(_.getLong(0)).toSeq.sorted == wantAnti)
  }

  test("STREAMING stand-down: a stream-static arrays_overlap LeftSemi " +
      "keeps the naive (supported) plan — no smuggled streaming " +
      "aggregate — and emits exactly the naive semi rows per batch") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val banned = Seq((10L, Seq("bad", "worse")), (11L, Seq("evil")))
      .toDF("bid", "btoks")
    val src = MemoryStream[StreamDoc]
    val q = src.toDF()
      .join(banned, arrays_overlap(col("toks"), col("btoks")), "left_semi")
      .select("did")
      .writeStream.format("memory").queryName("overlap_semi_standdown")
      .outputMode("append").start()
    try {
      src.addData(StreamDoc(1L, Seq("ok", "bad")), StreamDoc(2L, Seq("ok")),
        StreamDoc(3L, Seq("evil", "x")), StreamDoc(1L, Seq("ok", "bad")))
      q.processAllAvailable()
      val got = spark.table("overlap_semi_standdown")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(got == Seq(1L, 1L, 3L),
        s"stream-static semi must keep naive semantics: $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS overlap_semi_standdown")
    }
  }

  test("stands down for unsound spellings: an exists-HOF whose inner " +
      "array mentions the lambda variable (lifting it would unbind it) " +
      "and a Jaccard multiply with a user-written NARROWING cast " +
      "(stripping it would change the compared value)") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Seq[String]("a", "b")), (2L, Seq[String]()),
      (3L, Seq[String](null))).toDF("lid", "la")
    val r = Seq((10L, Seq[String]("c"))).toDF("rid", "ra")
    // concat(ra, array(e)) always contains e, so the naive predicate is
    // TRUE whenever la has a non-null element — a rewrite that lifted
    // the lambda-bound `e` out of scope would evaluate garbage instead
    val esc = l.join(r,
      expr("exists(la, e -> array_contains(concat(ra, array(e)), e))"))
    assert(!esc.queryExecution.executedPlan.toString.contains("graft_elem"),
      "lambda-variable-referencing inner array must stand down")
    assert(esc.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(1L), "naive evaluation is ground truth")
    val lt = Seq((1L, Seq(10L, 20L, 30L))).toDF("lid", "la")
    val rt = Seq((7L, Seq(20L, 30L, 40L))).toDF("rid", "ra")
    val narrowed = lt.join(rt,
      expr("size(array_intersect(la, ra)) " +
        "> 0.5 * cast(size(array_union(la, ra)) as tinyint)"))
    assert(!narrowed.queryExecution.executedPlan.toString
      .contains("graft_elem"),
      "value-changing cast around the union size must stand down")
    // naive evaluation still answers: intersect=2, 0.5*cast(4)=2.0,
    // 2 > 2.0 is false → no rows (the cast only bites at |union|>127,
    // but the rule must not assume that)
    assert(narrowed.count() == 0)
  }

  test("stands down when disabled by conf, when an equi-join already " +
      "links the sides, and for left joins") {
    val sess = spark
    import sess.implicits._
    val (l, r) = fixtures
    val left = l.toDF("lid", "la")
    val right = r.toDF("rid", "ra")
    spark.conf.set(ScaleGuards.OverlapJoinRewriteKey, "false")
    try {
      val off = left.join(right, arrays_overlap(col("la"), col("ra")))
        .select("lid", "rid")
      assert(!off.queryExecution.executedPlan.toString.contains("graft_elem"))
      assert(off.collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSeq.sorted == naive(l, r), "naive evaluation is ground truth")
    } finally spark.conf.unset(ScaleGuards.OverlapJoinRewriteKey)
    val equi = left.join(right,
      col("lid") === col("rid") && arrays_overlap(col("la"), col("ra")))
    assert(!equi.queryExecution.executedPlan.toString.contains("graft_elem"))
    // outer joins keep their semantics: no rewrite
    val louter = left.join(right,
      arrays_overlap(col("la"), col("ra")), "left")
    assert(!louter.queryExecution.executedPlan.toString
      .contains("graft_elem"))
    assert(louter.count() >= left.count())
  }

  test("pure-SQL DECIMAL tau literals fire the Jaccard rewrite (the " +
      "parser types 0.5 as DECIMAL, not DOUBLE) — both > and >= " +
      "spellings, answers identical to the naive decimal-exact " +
      "evaluation incl. the boundary pair the one-element slop guards") {
    val sess = spark
    import sess.implicits._
    // (1,7): intersect 2 of union 4 — exactly tau = 0.5: IN for >=, OUT
    // for >; (2,8): intersect 2 of union 3 — IN for both; (4,5): the
    // empty-empty pair the >= spelling must also emit; 3 matches
    // NOTHING (non-empty grams, no shared element) so the semi/anti
    // assertions below are two-sided — an over-matching regression
    // (predicate dropped, extra rows kept) fails them too
    val l = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 50L)),
      (3L, Seq(99L)), (4L, Seq[Long]()))
    val r = Seq((7L, Seq(20L, 30L, 40L)), (8L, Seq(10L, 50L, 60L)),
      (5L, Seq[Long]()))
    l.toDF("lid", "la").createOrReplaceTempView("jac_l")
    r.toDF("rid", "ra").createOrReplaceTempView("jac_r")
    def naive(orEq: Boolean): Seq[(Long, Long)] = (for {
      (li, la) <- l; (ri, ra) <- r
      i = la.distinct.count(ra.distinct.contains)
      u = (la ++ ra).distinct.size
      if (if (orEq) i * 2 >= u else i * 2 > u) // exact 0.5 in integers
    } yield (li, ri)).sorted
    for (op <- Seq(">", ">=")) {
      val q = spark.sql(
        s"""SELECT lid, rid FROM jac_l JOIN jac_r
           |ON size(array_intersect(la, ra))
           |   $op 0.5 * size(array_union(la, ra))""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_elem"),
        s"decimal-tau $op spelling must fire:\n$plan")
      val got = q.collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSeq.sorted
      assert(got == naive(op == ">="), s"$op: got=$got")
    }
    // fixture self-check: the boundary pair separates the spellings
    assert(naive(true).contains((1L, 7L)) && !naive(false).contains((1L, 7L)))
    assert(naive(true).contains((4L, 5L)), "empty-empty present for >=")

    // SQL `WHERE [NOT] EXISTS` spellings become semi/anti joins only in
    // the late RewriteSubquery batch — AFTER the extension-injected rule
    // instances have run — so they are served by the second registration
    // in spark.experimental.extraOptimizations ("User Provided
    // Optimizers", post-subquery). Pin that the decimal-tau >= semi AND
    // anti both fire there with the boundary semantics intact (lid 1 is
    // kept by >= ONLY via the exact-0.5 pair, lid 4 ONLY via
    // empty-empty; anti is the complement)
    val semi = spark.sql(
      """SELECT lid FROM jac_l WHERE EXISTS (SELECT 1 FROM jac_r
        |WHERE size(array_intersect(la, ra))
        |      >= 0.5 * size(array_union(la, ra)))""".stripMargin)
    assert(semi.queryExecution.executedPlan.toString.contains("graft_"),
      "the EXISTS-spelled decimal-tau >= semi must fire the " +
        "post-subquery rewrite:\n" + semi.queryExecution.executedPlan)
    val semiIds = semi.collect().map(_.getLong(0)).toSeq.sorted
    assert(semiIds == Seq(1L, 2L, 4L), s"semi: $semiIds")
    val anti = spark.sql(
      """SELECT lid FROM jac_l WHERE NOT EXISTS (SELECT 1 FROM jac_r
        |WHERE size(array_intersect(la, ra))
        |      >= 0.5 * size(array_union(la, ra)))""".stripMargin)
    assert(anti.queryExecution.executedPlan.toString.contains("graft_"),
      "the NOT-EXISTS-spelled decimal-tau >= anti must fire the " +
        "post-subquery rewrite:\n" + anti.queryExecution.executedPlan)
    assert(anti.collect().map(_.getLong(0)).toSeq == Seq(3L),
      "only the no-shared-element row survives the scrub")
  }

  test("a cloned session honors its OWN conf through the inherited " +
      "late-batch rule instances (ExperimentalMethods.clone copies the " +
      "registrations; conf reads ride the thread-active SQLConf)") {
    val sess = spark
    import sess.implicits._
    Seq((1L, Seq(10L)), (2L, Seq(20L))).toDF("lid", "la")
      .createOrReplaceTempView("clone_l")
    Seq((7L, Seq(10L))).toDF("rid", "ra")
      .createOrReplaceTempView("clone_r")
    val existsSql =
      """SELECT lid FROM clone_l c WHERE EXISTS (SELECT 1 FROM clone_r b
        |WHERE size(array_intersect(c.la, b.ra))
        |      >= 0.5 * size(array_union(c.la, b.ra)))""".stripMargin
    // cloneSession is private[sql] (Spark clones internally for
    // streaming/AQE executions — the scenario this pins); Scala
    // package-private is public bytecode, so reflection reaches it
    val clone = spark.getClass.getMethod("cloneSession").invoke(spark)
      .asInstanceOf[org.apache.spark.sql.SparkSession]
    clone.conf.set(ScaleGuards.OverlapJoinRewriteKey, "false")
    val onClone = clone.sql(existsSql)
    assert(!onClone.queryExecution.executedPlan.toString.contains("graft_"),
      "the clone disabled the rewrite — its queries must not fire it:\n"
        + onClone.queryExecution.executedPlan)
    assert(onClone.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the parent session's conf is untouched: same query still fires
    val onParent = spark.sql(existsSql)
    assert(onParent.queryExecution.executedPlan.toString.contains("graft_"),
      "the parent keeps the rewrite:\n" + onParent.queryExecution.executedPlan)
    assert(onParent.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("non-binary collations stand the rewrite down: UTF8_LCASE " +
      "equality is collation-aware while xxhash64 hashes bytes — the " +
      "naive plan keeps the collation-correct answer") {
    spark.sql("DROP VIEW IF EXISTS col_l")
    spark.sql("DROP VIEW IF EXISTS col_r")
    spark.sql(
      """CREATE TEMP VIEW col_l AS SELECT 1L AS lid,
        |array(cast('Foo' as string collate utf8_lcase)) AS la""".stripMargin)
    spark.sql(
      """CREATE TEMP VIEW col_r AS SELECT 7L AS rid,
        |array(cast('FOO' as string collate utf8_lcase)) AS ra""".stripMargin)
    val j = spark.sql(
      "SELECT lid, rid FROM col_l JOIN col_r ON arrays_overlap(la, ra)")
    assert(!j.queryExecution.executedPlan.toString.contains("graft_elem"),
      "collated element arrays must stand down:\n"
        + j.queryExecution.executedPlan)
    // the collation-aware naive answer: 'Foo' = 'FOO' under UTF8_LCASE
    assert(j.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      == Seq((1L, 7L)))
  }

  test("a huge tau is clamped in Long before the Int cast: the naive " +
      "predicate evaluates harmlessly in double arithmetic, so the " +
      "rewrite must not introduce an ANSI CAST_OVERFLOW crash") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Seq(10L, 20L))).toDF("lid", "la")
    val r = Seq((7L, Seq(10L, 30L))).toDF("rid", "ra")
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "fixture premise: ANSI on (the session default)")
    val strict = l.join(r, size(array_intersect(col("la"), col("ra")))
      > lit(1e9) * size(array_union(col("la"), col("ra"))))
    assert(strict.queryExecution.executedPlan.toString.contains("graft_elem"))
    assert(strict.count() == 0L, "no pair clears tau = 1e9")
    // >= admits only the (absent) empty-empty pairs at this tau
    val orEq = l.join(r, size(array_intersect(col("la"), col("ra")))
      >= lit(1e9) * size(array_union(col("la"), col("ra"))))
    assert(orEq.count() == 0L)
  }

  test("an EqualNullSafe (<=>) conjunct already linking the sides " +
      "stands the rewrite down, like EqualTo — the hash join is " +
      "already O(collisions), exploding it would be strictly worse") {
    val sess = spark
    import sess.implicits._
    val left = Seq((1L, Seq(10L, 20L))).toDF("lid", "la")
    val right = Seq((1L, Seq(20L, 30L))).toDF("rid", "ra")
    val j = left.join(right,
      (col("lid") <=> col("rid")) && arrays_overlap(col("la"), col("ra")))
    assert(!j.queryExecution.executedPlan.toString.contains("graft_elem"),
      "null-safe equi-linked join must stand down")
    assert(j.count() == 1L)
  }

  test("Jaccard recognizer stands down under spark.sql.legacy.sizeOfNull: " +
      "size(NULL) = -1 makes -1 >= tau*(-1) TRUE for tau >= 1 — NULL-array " +
      "pairs the witnessed rewrite cannot emit; naive answer intact") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Option(Seq(10L, 20L))), (2L, Option.empty[Seq[Long]]))
      .toDF("lid", "la")
    val r = Seq((7L, Option(Seq(10L, 20L))), (8L, Option.empty[Seq[Long]]))
      .toDF("rid", "ra")
    // ANSI mode (the session default) forces legacySizeOfNull=false and
    // the conf is inert — the hole only opens with BOTH ansi off and the
    // legacy conf on, so that is the configuration pinned here
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val j = l.join(r,
          size(array_intersect(col("la"), col("ra")))
            >= lit(1.0) * size(array_union(col("la"), col("ra"))))
        .select("lid", "rid")
      assert(!j.queryExecution.executedPlan.toString.contains("graft_elem"),
        "legacy-size Jaccard must stand down:\n"
          + j.queryExecution.executedPlan)
      // legacy naive semantics: every pair with a NULL side qualifies
      // (-1 >= -1), plus the genuinely identical (1,7) pair
      assert(j.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
        == Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L)))
    } finally {
      spark.conf.unset("spark.sql.legacy.sizeOfNull")
      spark.conf.unset("spark.sql.ansi.enabled")
    }
    // and with the conf back off the same spelling fires again
    val fired = l.join(r,
      size(array_intersect(col("la"), col("ra")))
        >= lit(1.0) * size(array_union(col("la"), col("ra"))))
    assert(fired.queryExecution.executedPlan.toString.contains("graft_elem"),
      "non-legacy spelling must still rewrite")
  }
}

/** Top-level so Spark's encoder codegen works (nested suite case
  * classes fall back to interpreted projections). */
case class StreamDoc(did: Long, toks: Seq[String])
