package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stand-down diagnostics: when a join's condition looks like the
  * overlap family but a gate disqualifies the rewrite, the user is left
  * with a silent nested-loop plan — the rule now names the disqualifier
  * once (WARN + PreflightLog, served by /v1/preflight). The round-11
  * re-fixture hit the containsNull case below in production code: only
  * a plan probe revealed why the rewrite had not fired. */
class StandDownSpec extends SparkSuite {

  private def capturing(body: => Unit): Seq[String] =
    LogCapture.capturing(classOf[SetOverlapJoinRewrite],
      classOf[HammingBlockJoinRewrite])(body)

  private def standDowns(lines: Seq[String]): Seq[String] =
    lines.filter(_.contains("rewrite stand-down"))

  test("a containsNull=true gram spelling (transform-then-drop-nulls) is " +
      "diagnosed ONCE per condition — not once per fixed-point iteration " +
      "— naming the null-free respelling, and reaches PreflightLog") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    PreflightLog.clear()
    // the exact trap: CASE inside transform makes elements nullable and
    // the trailing is-not-null filter does NOT narrow the TYPE
    def side(n: String) = Seq((1L, "alpha beta c"), (2L, "beta gamma d"))
      .toDF("id", "text")
      .select(col("id").as(s"${n}_id"), expr(
        "filter(transform(split(text, ' '), x -> " +
          "CASE WHEN length(x) > 1 THEN x END), x -> x IS NOT NULL)")
        .as(s"${n}_g"))
    val joined = side("l").join(side("r"),
      size(array_intersect(col("l_g"), col("r_g"))) >= lit(1))
    val lines = capturing { assert(joined.count() >= 2L) }
    val sd = standDowns(lines)
    assert(sd.size == 1,
      s"expected exactly one diagnosis (dedup across optimizer " +
        s"iterations), got ${sd.size}: $sd")
    assert(sd.head.contains("containsNull=true"), sd.head)
    assert(sd.head.contains("pre-filtered positions"), sd.head)
    assert(PreflightLog.recent().exists(
        a => a.line.contains("containsNull=true") && !a.aborted),
      s"stand-down must reach the management surface: ${PreflightLog.recent()}")
  }

  test("a LeftAnti over float-element arrays names the hash-unsafe " +
      "disqualifier (NaN/signed-zero) instead of silently nested-looping") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    val left = Seq((1L, Seq(1.5, 2.5)), (2L, Seq(9.0)))
      .toDF("lid", "la")
    val right = Seq((1L, Seq(1.5))).toDF("rid", "ra")
    val lines = capturing {
      assert(left.join(right,
        size(array_intersect(col("la"), col("ra"))) >= lit(1),
        "left_anti").count() == 1L)
    }
    val sd = standDowns(lines)
    assert(sd.nonEmpty, s"expected a diagnosis, got: $lines")
    assert(sd.head.contains("float/double"), sd.head)
  }

  test("hamming near-misses are diagnosed too: INT fingerprints name the " +
      "BIGINT cast, an over-wide radius names the k<=15 bound") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    // INT fingerprints: bit_count(a ^ b) parses but the block layout
    // assumes 64-bit values — the rule walks away silently otherwise
    val li = Seq((1, 3), (2, 12)).toDF("lid", "lfp")
    val ri = Seq((7, 3)).toDF("rid", "rfp")
    val intLines = capturing {
      assert(li.join(ri,
        expr("bit_count(lfp ^ rfp) <= 2")).count() == 1L)
    }
    val sdInt = standDowns(intLines)
    assert(sdInt.nonEmpty, s"expected a diagnosis, got: $intLines")
    assert(sdInt.head.contains("not BIGINT"), sdInt.head)
    // radius 20 > 15: candidate volume defeats the block join
    val ll = Seq((1L, 3L), (2L, 12L)).toDF("lid", "lfp")
    val rl = Seq((7L, 3L)).toDF("rid", "rfp")
    val kLines = capturing {
      assert(ll.join(rl,
        expr("bit_count(lfp ^ rfp) <= 20")).count() == 2L)
    }
    val sdK = standDowns(kLines)
    assert(sdK.nonEmpty, s"expected a diagnosis, got: $kLines")
    assert(sdK.head.contains("k=20"), sdK.head)
    // a LOWER-bound (far-pairs) predicate is not a near-miss of this
    // rewrite in any spelling — "tighten the radius" would be wrong
    // advice, so it must stay silent
    val farLines = capturing {
      assert(ll.join(rl,
        expr("bit_count(lfp ^ rfp) >= 20")).count() == 0L)
    }
    assert(standDowns(farLines).isEmpty,
      s"far-pairs predicates are not near-misses: ${standDowns(farLines)}")
  }

  test("a degenerate always-false bound (hamming64 < 0, effective " +
      "k=-1) is named — the empty join is harmless, but a vacuous " +
      "radius is almost certainly a spelling mistake, not a query") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    val ll = Seq((1L, 3L), (2L, 12L)).toDF("lid", "lfp")
    val rl = Seq((7L, 3L)).toDF("rid", "rfp")
    val lines = capturing {
      assert(ll.join(rl,
        expr("bit_count(lfp ^ rfp) < 0")).count() == 0L)
    }
    val sd = standDowns(lines)
    assert(sd.nonEmpty, s"expected a vacuous-bound diagnosis, got: $lines")
    assert(sd.head.contains("vacuously false (effective k=-1)"), sd.head)
    assert(sd.head.contains("did you mean <="), sd.head)
    // the GreaterThan orientation (0 > hamming) must suggest the
    // operator the user actually wrote: >= — following a "<=" hint
    // literally would build the tautology 0 <= hamming (a cartesian)
    RewriteSupport.clearStandDownLog()
    val gtLines = capturing {
      assert(ll.join(rl,
        expr("0 > bit_count(lfp ^ rfp)")).count() == 0L)
    }
    val sdGt = standDowns(gtLines)
    assert(sdGt.nonEmpty, s"expected a diagnosis, got: $gtLines")
    assert(sdGt.head.contains("vacuously false (effective k=-1)"), sdGt.head)
    assert(sdGt.head.contains("did you mean >="), sdGt.head)
    // a NEGATIVE LITERAL (<= -2) is the radius mistyped, not the
    // comparison operator — "did you mean <=" would point at the wrong
    // token for a user who already wrote <=
    RewriteSupport.clearStandDownLog()
    val litLines = capturing {
      assert(ll.join(rl,
        expr("bit_count(lfp ^ rfp) <= -2")).count() == 0L)
    }
    val sdLit = standDowns(litLines)
    assert(sdLit.nonEmpty, s"expected a diagnosis, got: $litLines")
    assert(sdLit.head.contains("vacuously false (effective k=-2)"), sdLit.head)
    assert(sdLit.head.contains("radius literal is negative"), sdLit.head)
    assert(!sdLit.head.contains("did you mean"), sdLit.head)
  }

  test("one condition carrying near-misses for BOTH rules gets BOTH " +
      "diagnoses — neither rule's dedup may suppress the other's") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    // nullable gram arrays (overlap near-miss) AND k=20 hamming radius
    // (hamming near-miss) in one conjunction
    val left = Seq((1L, "aa bb c", 3L)).toDF("lid", "ltext", "lfp")
      .select(col("lid"), expr(
        "filter(transform(split(ltext, ' '), x -> " +
          "CASE WHEN length(x) > 1 THEN x END), x -> x IS NOT NULL)")
        .as("lg"), col("lfp"))
    val right = Seq((2L, "bb dd e", 12L)).toDF("rid", "rtext", "rfp")
      .select(col("rid"), expr(
        "filter(transform(split(rtext, ' '), x -> " +
          "CASE WHEN length(x) > 1 THEN x END), x -> x IS NOT NULL)")
        .as("rg"), col("rfp"))
    val lines = capturing {
      assert(left.join(right,
        size(array_intersect(col("lg"), col("rg"))) >= lit(1)
          && expr("bit_count(lfp ^ rfp) <= 20")).count() == 1L)
    }
    val sd = standDowns(lines)
    assert(sd.exists(_.contains("containsNull=true")),
      s"overlap diagnosis missing: $sd")
    assert(sd.exists(_.contains("k=20")),
      s"hamming diagnosis missing: $sd")
  }

  test("shapes no gate fix can serve stay silent: an OR-wrapped hamming " +
      "bound and a negated overlap are not near-misses, and an implied " +
      "arrays_overlap anti blames the rowid, never float elements") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    val ll = Seq((1L, 3L), (2L, 12L)).toDF("lid", "lfp")
    val rl = Seq((7L, 3L)).toDF("rid", "rfp")
    val orLines = capturing {
      // the OR defeats the rewrite at ANY radius — advising "tighten
      // k" would send the user in a circle
      assert(ll.join(rl,
        expr("bit_count(lfp ^ rfp) <= 20 OR lid = rid")).count() >= 1L)
    }
    assert(standDowns(orLines).isEmpty,
      s"OR-wrapped bounds are not near-misses: ${standDowns(orLines)}")
    val la = Seq((1L, "aa bb c")).toDF("lid", "ltext").select(col("lid"),
      expr("filter(transform(split(ltext, ' '), x -> CASE WHEN " +
        "length(x) > 1 THEN x END), x -> x IS NOT NULL)").as("lg"))
    val ra = Seq((2L, "bb dd e")).toDF("rid", "rtext").select(col("rid"),
      expr("filter(transform(split(rtext, ' '), x -> CASE WHEN " +
        "length(x) > 1 THEN x END), x -> x IS NOT NULL)").as("rg"))
    val notLines = capturing {
      assert(la.join(ra, !arrays_overlap(col("lg"), col("rg")))
        .count() == 0L)
    }
    assert(standDowns(notLines).isEmpty,
      s"a negated overlap is served by no spelling: ${standDowns(notLines)}")
    // implied arrays_overlap anti over float elements with a SAMPLE
    // below (a Limit folds into the LocalRelation; Sample survives and
    // blocks the rowid push): the real blocker is the unstable rowid
    // (twoPhaseSemi joins RAW elements — floats are fine there);
    // bit-casting would fix nothing, so the float advice must not
    // appear
    val lf = Seq((1L, Seq(1.5, 2.5)), (2L, Seq(9.0))).toDF("lid", "la")
      .sample(withReplacement = false, 1.0, seed = 42)
    val rf = Seq((1L, Seq(1.5))).toDF("rid", "ra")
    val antiLines = capturing {
      assert(lf.join(rf, arrays_overlap(col("la"), col("ra")), "left_anti")
        .count() == 1L)
    }
    val sd = standDowns(antiLines)
    assert(sd.nonEmpty, s"expected a topology diagnosis, got: $antiLines")
    assert(!sd.head.contains("float/double"),
      s"implied paths never hash — floats are not the blocker: ${sd.head}")
    assert(sd.head.contains("STABLE rowid"), sd.head)
  }

  test("PreflightLog is a bounded latest-first ring: past capacity the " +
      "oldest lines fall out — a long-lived session cannot grow it") {
    PreflightLog.clear()
    (1 to PreflightLog.Capacity + 10).foreach(i =>
      PreflightLog.record(s"audit line $i", aborted = i % 2 == 0,
        rule = "overlap-join", kind = "preflight", diagnosis = "ok"))
    val r = PreflightLog.recent()
    assert(r.size == PreflightLog.Capacity, s"ring size ${r.size}")
    assert(r.head.line == s"audit line ${PreflightLog.Capacity + 10}",
      s"latest first, got ${r.head}")
    assert(r.last.line == "audit line 11",
      s"oldest surviving entry, got ${r.last}")
    PreflightLog.clear()
  }

  test("joins the rewrite FIRES on, equi-joins, and unrelated theta " +
      "joins stay silent") {
    val sess = spark
    import sess.implicits._
    RewriteSupport.clearStandDownLog()
    val left = Seq((1L, Seq(1L, 2L)), (2L, Seq(9L))).toDF("lid", "la")
    val right = Seq((1L, Seq(1L))).toDF("rid", "ra")
    val lines = capturing {
      // fires: clean long-element overlap
      assert(left.join(right,
        arrays_overlap(col("la"), col("ra"))).count() == 1L)
      // unrelated theta join: no overlap shape anywhere
      assert(left.join(right, col("lid") > col("rid")).count() == 1L)
      // equi-join alongside an overlap conjunct: already O(collisions)
      assert(left.join(right, col("lid") === col("rid")
        && arrays_overlap(col("la"), col("ra"))).count() == 1L)
    }
    assert(standDowns(lines).isEmpty,
      s"no stand-down fired here, nothing to diagnose: ${standDowns(lines)}")
  }
}
