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
}
