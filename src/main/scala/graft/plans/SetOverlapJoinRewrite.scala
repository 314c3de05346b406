package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, MapType, StringType, StructType}

/** Exact explode rewrite for set-overlap theta joins — the companion of
  * [[HammingBlockJoinRewrite]], automating d02's group-and-expand
  * topology for naive user queries: a join whose only cross-side
  * predicate is `arrays_overlap(a, b)` (or an intersect-size threshold,
  * see below) plans as a nested-loop cartesian — |L|·|R| array
  * comparisons. But any qualifying pair shares at least one element
  * (the same pigeonhole identity as the Hamming blocks), so the join is
  * EXACTLY equivalent to exploding the distinct elements of each side
  * and equi-joining on the element — a plain shuffled hash join costing
  * O(element collisions).
  *
  * TWO topologies, chosen by estimated input size:
  *
  * IN-PLACE (small inputs): explode both sides' distinct elements over
  * the full rows and equi-join on the element. Every qualifying pair is
  * emitted exactly once: the match is additionally pinned to the pair's
  * MINIMUM non-null common element (`ea = array_min(array_intersect(a,
  * b))`), so of the possibly-many shared elements exactly one produces
  * the row — no dedup aggregate, row multiplicities preserved verbatim.
  * The exchange carries each row's full payload (arrays included) once
  * PER ELEMENT — O(|arr|²) bytes per row — which is fine below the
  * [[ScaleGuards.OverlapTwoPhaseMinBytesKey]] floor and ruinous above
  * it.
  *
  * TWO-PHASE (large inputs — the 100 TB shape, d02's own topology):
  *  1. tag each side's rows with a reproducible rowid
  *     ([[RewriteSupport.withStableRowId]]);
  *  2. explode ONLY `(rowid, xxhash64(element))` — 16-byte candidate
  *     rows, plus any scalar columns that cross-side non-array
  *     conjuncts need (so e.g. an `a_id < b_id` dedup-ordering prunes
  *     candidates before they cost anything);
  *  3. equi-join the hashes, apply those scalar conjuncts, and collapse
  *     to DISTINCT `(rowid_l, rowid_r)` pairs (partial aggregation
  *     dedups map-side);
  *  4. join the pair-list back to each tagged side on its rowid (the
  *     full payloads now cross the wire ONCE per matching pair, not
  *     once per element), and re-apply the ORIGINAL predicate raw.
  * The raw re-application makes the topology exact — not
  * probabilistic: hash collisions only ever ADD candidate pairs, and
  * the final `arrays_overlap`/threshold evaluation removes them. Each
  * qualifying pair appears exactly once (rowids are unique, the
  * pair-list is distinct), so multiplicities are preserved verbatim.
  * Falls back to IN-PLACE when no order-stable rowid insertion point
  * exists (see [[RewriteSupport.withStableRowId]]), when a side is
  * streaming, or for float/double elements (hash/equality disagree on
  * NaN families).
  *
  * Null exactness (both topologies) mirrors `arrays_overlap`'s own
  * contract: TRUE only when a non-null common element exists (null-only
  * overlap yields NULL → the pair is rejected); exploded equi-joins
  * never match null elements, and the two-phase hash explode drops
  * nulls before hashing.
  *
  * Accepted conjunct spellings:
  *  - `arrays_overlap(a, b)` — exact for any atomic element type,
  *    nullable elements included (per the argument above);
  *  - `size(array_intersect(a, b)) >= k` with k ≥ 1 (and the >, and
  *    reversed-literal, spellings) — here `size` COUNTS a shared null,
  *    so this form fires only when the array types are statically
  *    null-free (`containsNull = false`); the full threshold predicate
  *    is re-applied after the equi-join. For k ≥ 2 both sides explode
  *    only their SSJoin PREFIX — the smallest (size − k + 1) distinct
  *    elements in ascending order ([[RewriteSupport.prefixElems]]'s
  *    c-th-largest-common-element lemma guarantees a shared prefix
  *    element for every qualifying pair) — cutting exploded rows and
  *    candidate pairs roughly quadratically as k grows.
  *  - `size(array_intersect(a, b)) > τ · size(array_union(a, b))` with
  *    a literal τ ≥ 0 — the naive STRICT-Jaccard near-dup spelling
  *    (operand order, comparison direction, and the analyzer's casts
  *    all normalized). Strict `>` excludes the empty-empty pair (0 > 0
  *    fails), so a qualifying pair always has a non-null witness.
  *    Prefix bound per row:
  *    |∩| > τ·|∪| ≥ τ·|A| ⇒ |∩| ≥ floor(τ·|A|) + 1, evaluated in the
  *    predicate's own double arithmetic (multiplication is monotone in
  *    |∪| ≥ |A|, so the bound is exact, not approximate).
  *  - the `>=` spelling with a literal τ > 0: its qualifying pairs
  *    split EXACTLY into witnessed pairs (|∩| ≥ 1 — per-row bound
  *    c_row = max(ceil(τ·|A|), 1), same double-monotone argument) and
  *    the witness-less empty-empty pairs (0 >= τ·0 is TRUE for every
  *    τ). Inner/cross: the witnessed two-phase UNION a
  *    broadcast-hinted cross of the two (tiny, size-0-filtered)
  *    empty-array subsets — see [[withEmptyEmptyBranch]]. Semi/anti
  *    (round 10): the SAME split at the rowid level — the witnessed
  *    matched-rowid set unions the rowids of empty left rows that
  *    LeftSemi-match an empty right row, and the back join's type
  *    decides survival (see [[twoPhaseSemiVerify]]); requires a stable
  *    rowid like every anti, stands down otherwise. τ = 0 with `>=`
  *    is TRUE for every pair (a genuine full cross) and stands down
  *    in every form.
  *  - `array_contains(a, x)` with `a` and `x` on opposite sides (the
  *    tag-lookup membership join) — only the array side explodes and
  *    no dedup pin is needed (see [[rewriteMembership]]).
  *
  * LEFT SEMI joins — the decontamination shape
  * (`corpus.join(banned, arrays_overlap(toks, banned_toks),
  * "left_semi")`) — are also rewritten. Semi needs no multiplicity pin
  * at all (∃-semantics dedup partners for free); what it needs is to
  * collapse a row's surviving exploded copies back to one row:
  *  - two-phase (stable rowid available, large input, remaining
  *    conjuncts scalar): explode `(rowid, element)` slim rows, LeftSemi
  *    against the partner side's exploded elements (raw witness
  *    equality — exact by construction), collapse to distinct rowids,
  *    LeftSemi the tagged left side against them;
  *  - in-place otherwise: tag rows with a plain unique id (a single
  *    instantiation, so no order-stability needed), explode, LeftSemi
  *    with the full original predicate re-applied raw, then collapse
  *    grouping on the id ALONE with payloads riding `first()` over the
  *    singleton group ([[RewriteSupport.collapseBySrid]] — map-typed
  *    payloads group fine this way, and float payloads keep their
  *    exact bits instead of passing through NormalizeFloatingNumbers).
  *  - membership with the array on the RIGHT (`probe ⋉ tags`) needs
  *    none of that: the left side stays unexploded, so the semi's own
  *    semantics already emit each row once.
  *
  * LEFT ANTI joins — "keep the clean corpus" — reduce to the SAME
  * matching-rowid sets with the back join flipped to anti: the implied
  * spelling through [[twoPhaseSemi]], threshold/Jaccard spellings
  * through the pair-verify [[twoPhaseSemiVerify]] (candidates from the
  * hashed-prefix join, raw predicate re-checked on back-joined rows),
  * and left-array membership through [[twoPhaseSemiMembership]]. Anti
  * has no in-place form (its collapse is not a group-by over
  * survivors), so it requires a stable rowid and stands down otherwise.
  *
  * Fires only when the overlap conjunct spans the two sides, the
  * element type is atomic (orderable + joinable), and no equi-conjunct
  * already links the sides (an existing equi-join is already
  * O(collisions); this also makes the rewrite a fixed point — every
  * join it emits is an equi-join). Default ON; disable with
  * `spark.graft.overlapJoinRewrite=false`.
  */
class SetOverlapJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import RewriteSupport._

  import SetOverlapJoinRewrite.OverlapPred

  private def nullFree(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  /** Strip only VALUE-PRESERVING numeric widenings (the casts the
    * analyzer inserts around `size(...)` in a double comparison:
    * int→long, int→double, float→double). A user-written NARROWING
    * cast (`cast(size(...) as tinyint)`) changes the compared value,
    * so stripping it would make the Jaccard prefix bound unsound —
    * those spellings stand down instead. */
  private def uncast(e: Expression): Expression = e match {
    case c: Cast if ((c.child.dataType, c.dataType) match {
        case (IntegerType, LongType | DoubleType) => true
        case (FloatType, DoubleType) => true
        // the analyzer's decimal promotions around size() in a
        // decimal-literal comparison (`> 0.8 * size(...)` in SQL casts
        // one side to decimal(10,0) and the other to decimal(12,1)) —
        // value-preserving for every int when p − s ≥ 10
        case (IntegerType, dt: DecimalType) =>
          dt.precision - dt.scale >= 10
        case _ => false
      }) => uncast(c.child)
    case _ => e
  }

  /** `size(array_intersect(a, b)) {>|>=} τ · size(array_union(a', b'))`
    * — the naive Jaccard near-dup spellings (modulo the analyzer's
    * numeric casts, multiplication operand order, and comparison
    * direction), with {a, b} ≡ {a', b'}. Strict `>` with τ ≥ 0 implies
    * a non-null shared element exists — 0 > 0 fails, so every
    * qualifying pair has a witness. The `>=` spelling ALSO admits the
    * witness-less empty-empty pairs (0 >= τ·0 holds for every τ), so
    * its rewrite is the witnessed two-phase UNION a guarded cross of
    * the two empty-array subsets; it requires τ > 0 (τ = 0 with `>=`
    * is TRUE for every pair — a genuine full cross, nothing to
    * rewrite, stands down). Returns (a, b, τ, orEqual). */
  private def jaccardConj(c: Expression)
      : Option[(Expression, Expression, Double, Boolean, Boolean)] = {
    // legacySizeOfNull=true Size nodes stand down HERE (unlike the
    // intersect-size thresholds below, where legacy's size(NULL) = -1
    // never reaches a >= 1 bound and both modes drop the row): with
    // both sides negative, -1 {>|>=} tau * -1 is TRUE for tau > 1
    // (resp. tau >= 1), so the legacy naive plan emits NULL-array
    // pairs this rewrite cannot reproduce.
    def interSides(e: Expression): Option[(Expression, Expression)] =
      uncast(e) match {
        case Size(ArrayIntersect(a, b), false) => Some((a, b))
        case _ => None
      }
    // (tau-as-double, slop, union sides): a DOUBLE τ literal runs the
    // bound in the predicate's own arithmetic (slop = false); a DECIMAL
    // τ literal (the pure-SQL `0.8` spelling — exact decimal predicate
    // arithmetic) carries slop = true so the double-computed bound
    // subtracts one element (see OverlapPred.jaccardSlop)
    def tauUnion(e: Expression)
        : Option[(Double, Boolean, Expression, Expression)] =
      e match {
        case Multiply(m1, m2, _) =>
          def lit(x: Expression): Option[(Double, Boolean)] =
            uncast(x) match {
              case Literal(d: Double, DoubleType) => Some((d, false))
              case Literal(d: Decimal, _: DecimalType) if d != null =>
                Some((d.toDouble, true))
              case _ => None
            }
          def union(x: Expression): Option[(Expression, Expression)] =
            uncast(x) match {
              case Size(ArrayUnion(u, v), false) => Some((u, v))
              case _ => None
            }
          (for ((t, sl) <- lit(m1); (u, v) <- union(m2))
            yield (t, sl, u, v))
            .orElse(for ((t, sl) <- lit(m2); (u, v) <- union(m1))
              yield (t, sl, u, v))
        case _ => None
      }
    val parts = c match {
      case GreaterThan(x, y) =>
        interSides(x).zip(tauUnion(y)).map((_, false))
      case LessThan(y, x) =>
        interSides(x).zip(tauUnion(y)).map((_, false))
      case GreaterThanOrEqual(x, y) =>
        interSides(x).zip(tauUnion(y)).map((_, true))
      case LessThanOrEqual(y, x) =>
        interSides(x).zip(tauUnion(y)).map((_, true))
      case _ => None
    }
    parts.collect {
      case (((a, b), (tau, slop, u, v)), orEqual)
          if (if (orEqual) tau > 0.0 else tau >= 0.0)
            && nullFree(a) && nullFree(b)
            && ((a.semanticEquals(u) && b.semanticEquals(v))
              || (a.semanticEquals(v) && b.semanticEquals(u))) =>
        (a, b, tau, orEqual, slop)
    }
  }

  /** All overlap-family conjuncts, in order — the first candidate that
    * ORIENTS across the two sides wins, so a same-side
    * `arrays_overlap(a1, a2)` conjunct ahead of the real cross-side one
    * no longer defeats the rewrite. */
  private def overlapConjuncts(cs: Seq[Expression]): Seq[OverlapPred] =
    cs.flatMap { c =>
      val base = c match {
        case ArraysOverlap(a, b) =>
          Some(OverlapPred(c, a, b, implied = true, 1, None))
        // the HOF spelling of the same intent:
        // `exists(a, e -> array_contains(b, e))` — TRUE iff a non-null
        // element of `a` has a non-null match in `b` (a null element
        // makes array_contains NULL, never TRUE), i.e. exactly
        // arrays_overlap's witness contract under either three-valued
        // setting, so it is `implied` too. `b` must be FREE of lambda
        // variables: lifting an expression that mentions the bound
        // element (e.g. `array_contains(concat(ra, array(e)), e)`)
        // out of its lambda scope would leave the variable unbound in
        // the rewritten plan, so those shapes stand down.
        case ArrayExists(a,
            LambdaFunction(ArrayContains(b, ev: NamedLambdaVariable),
              Seq(lv: NamedLambdaVariable), _), _)
            if ev.exprId == lv.exprId
              && b.find(_.isInstanceOf[NamedLambdaVariable]).isEmpty =>
          Some(OverlapPred(c, a, b, implied = true, 1, None))
        case GreaterThanOrEqual(Size(ArrayIntersect(a, b), _),
              Literal(k: Int, IntegerType))
            if k >= 1 && nullFree(a) && nullFree(b) =>
          Some(OverlapPred(c, a, b, implied = false, k, None))
        case GreaterThan(Size(ArrayIntersect(a, b), _),
              Literal(k: Int, IntegerType))
            if k >= 0 && nullFree(a) && nullFree(b) =>
          Some(OverlapPred(c, a, b, implied = false, k + 1, None))
        case LessThanOrEqual(Literal(k: Int, IntegerType),
              Size(ArrayIntersect(a, b), _))
            if k >= 1 && nullFree(a) && nullFree(b) =>
          Some(OverlapPred(c, a, b, implied = false, k, None))
        case LessThan(Literal(k: Int, IntegerType),
              Size(ArrayIntersect(a, b), _))
            if k >= 0 && nullFree(a) && nullFree(b) =>
          Some(OverlapPred(c, a, b, implied = false, k + 1, None))
        case _ => None
      }
      base.orElse(jaccardConj(c).map { case (a, b, tau, orEqual, slop) =>
        OverlapPred(c, a, b, implied = false, 1, Some(tau), orEqual,
          jaccardSlop = slop)
      })
    }

  /** The candidate-generation element keys for one side under `p`'s
    * prefix bound — hashed 8-byte keys for the two-phase slim explode,
    * raw elements for the in-place/semi paths. Constant thresholds
    * c ≥ 2 slice to (size − c + 1); strict Jaccard τ slices to
    * (size − floor(τ·size)): a qualifying pair has |∩| > τ·|∪| ≥ τ·|A|
    * in the predicate's own double arithmetic (double multiplication is
    * monotone in |∪| ≥ |A|), so |∩| ≥ floor(τ·|A|) + 1 = c_row. */
  /** One extra prefix element for decimal-τ spellings, whose predicate
    * arithmetic is exact while this bound runs in double: in the regime
    * where the prefix can be non-empty (c_row ≤ size + 1, so τ·size ≤
    * 2³¹ + 1) the double product's total error is ≪ 1, so ceil/floor
    * overshoot the exact value by at most 1 — the slop absorbs it. */
  private def slopOf(p: OverlapPred): Long = if (p.jaccardSlop) 1L else 0L

  private def candidateElems(arr: Expression, p: OverlapPred,
      hashed: Boolean): Expression = {
    val len: Option[Expression => Expression] = p.jaccardTau match {
      // `>=`: a WITNESSED qualifying pair has |∩| ≥ τ·|∪| ≥ τ·|A| in the
      // predicate's own double arithmetic, and |∩| is an integer, so
      // |∩| ≥ ceil(τ·|A|); witnessed also means |∩| ≥ 1 — c_row =
      // max(ceil(τ·size), 1), prefix length size − c_row + 1
      // the length arithmetic runs in LONG with c_row clamped to ≤ s+1
      // (resp. the floor to ≤ s): the clamp never changes the result —
      // past it the prefix is empty either way — but it keeps the final
      // value inside [0, s] so the Int cast cannot overflow. Unclamped,
      // a large τ (1e9·size fits harmlessly in the predicate's double
      // arithmetic) would make Cast(ceil AS INT) throw CAST_OVERFLOW
      // under ANSI — a crash the naive plan never has.
      case Some(tau) if p.jaccardOrEqual => Some { s =>
        val sL = Cast(s, LongType)
        val cRow = Least(Seq(
          Greatest(Seq(
            Subtract(
              Ceil(Multiply(Literal(tau), Cast(s, DoubleType))),
              Literal(slopOf(p))),
            Literal(1L))),
          Add(sL, Literal(1L))))
        Cast(Add(Subtract(sL, cRow), Literal(1L)), IntegerType)
      }
      case Some(tau) => Some { s =>
        val sL = Cast(s, LongType)
        val fl = Least(Seq(
          Greatest(Seq(
            Subtract(
              Floor(Multiply(Literal(tau), Cast(s, DoubleType))),
              Literal(slopOf(p))),
            Literal(0L))),
          sL))
        Cast(Subtract(sL, fl), IntegerType)
      }
      case None if p.minOverlap >= 2 =>
        Some(s => Subtract(s, Literal(p.minOverlap - 1)))
      case None => None
    }
    (len, hashed) match {
      case (Some(f), true) => hashedPrefixElems(arr, f)
      case (Some(f), false) => prefixElems(arr, f)
      case (None, true) => hashedElems(arr)
      case (None, false) => ArrayDistinct(arr)
    }
  }

  /** Scalar (non-nested) orderable element — what both the equi-join
    * keys and the `array_min` dedup pin require. */
  private def atomicElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(et, _) => et match {
      case _: ArrayType | _: MapType | _: StructType => false
      // non-binary collations stand down (every path): SQL equality on
      // a collated string is collation-aware ('Foo' = 'FOO' under
      // UTF8_LCASE) while xxhash64 hashes raw bytes — the hashed
      // two-phase would silently drop qualifying pairs — and the
      // in-place pin/prefix orderings would each need a
      // collation-consistency proof of their own
      case s: StringType =>
        org.apache.spark.sql.graftbridge.ColumnBridge.binaryEqualityString(s)
      case other => RowOrdering.isOrderable(other)
    }
    case _ => false
  }

  private def sameElemType(a: Expression, b: Expression): Boolean =
    a.dataType.asInstanceOf[ArrayType].elementType ==
      b.dataType.asInstanceOf[ArrayType].elementType

  private def twoPhaseMinBytes: BigInt = BigInt(
    RewriteSupport.activeConf(ScaleGuards.OverlapTwoPhaseMinBytesKey)
      .map(_.toLong).getOrElse(ScaleGuards.OverlapTwoPhaseMinBytesDefault))

  private def bigEnoughForTwoPhase(l: LogicalPlan, r: LogicalPlan): Boolean =
    l.stats.sizeInBytes.max(r.stats.sizeInBytes) >= twoPhaseMinBytes

  /** xxhash64 and SQL equality agree (x = y ⇒ hash(x) = hash(y)) for
    * every atomic type except float/double, whose NaN families and
    * signed zeros compare equal without sharing bits. */
  private def hashSafeElem(a: Expression): Boolean =
    a.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType | DoubleType => false
      case _ => true
    }

  /** Stand-down diagnostics: when a join's condition LOOKS like the
    * overlap family but a gate disqualified it, the user is left with a
    * silent nested-loop plan and only a plan probe reveals why (the
    * round-11 re-fixture hit exactly this — a transform-then-drop-nulls
    * gram spelling types containsNull=true and the rule walked away).
    * Scan the conjuncts for near-miss shapes and name the disqualifier
    * once per canonicalized condition (WARN + [[PreflightLog]], where
    * the management API's /v1/preflight serves it). Pure structural
    * scan — no stats reads, no side jobs. */
  private def standDownReasons(cs: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Seq[String] = {
    val crossSides = RewriteSupport.crossSides(l, r) _
    val hits = scala.collection.mutable.LinkedHashSet.empty[String]
    def inspect(node: Expression): Unit = node match {
      case Size(ArrayIntersect(a, b), true) if crossSides(a, b) =>
        hits += ("spark.sql.legacy.sizeOfNull is on: size(NULL) = -1 " +
          "admits NULL-array pairs the rewrite cannot reproduce — unset " +
          "the legacy conf (or its ansi.enabled implication)")
      case op @ (_: ArrayIntersect | _: ArraysOverlap) =>
        val (a, b) = (op.children(0), op.children(1))
        if (crossSides(a, b)) {
          if (!nullFree(a) || !nullFree(b))
            hits += ("array elements are NULLABLE (containsNull=true) — " +
              "respell the derivation so the type is provably null-free " +
              "(e.g. transform over pre-filtered positions instead of " +
              "transform-then-drop-nulls)")
          if (!atomicElem(a) || !atomicElem(b))
            hits += ("element type is nested or non-binary-collated — " +
              "hashed witnesses cannot reproduce its equality; project " +
              "elements to an atomic binary-comparable form first")
          if (atomicElem(a) && atomicElem(b) && !sameElemType(a, b))
            hits += "element types differ between the two sides"
        }
      case _ => ()
    }
    // TOP-LEVEL conjuncts only — where overlapConjuncts/jaccardConj
    // look. Descend WITHIN a top-level comparison (the Jaccard
    // spelling nests intersect/union under casts and multiplies) or a
    // bare overlap, but never into OR/NOT/CASE wrappers: no gate fix
    // makes the rewrite serve those shapes, so advising one is wrong.
    cs.foreach {
      case c @ (_: ArraysOverlap | _: GreaterThan | _: GreaterThanOrEqual
          | _: LessThan | _: LessThanOrEqual) => c.foreach(inspect)
      case _ => ()
    }
    hits.toSeq
  }

  private def logStandDown(j: Join, reasons: Seq[String]): Unit =
    RewriteSupport.logStandDown("overlap-join", j, "array compares",
      reasons, logWarning(_))

  /** Semi/anti non-fires whose conjunct gates all PASSED are topological
    * stand-downs — name the likely cause instead of staying silent. */
  private def semiStandDownReasons(cs: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan,
      jt: org.apache.spark.sql.catalyst.plans.JoinType): Seq[String] =
    orientedOverlap(cs, l, r).toSeq.map { p =>
      if (l.isStreaming || r.isStreaming)
        "a streaming child: the collapse would smuggle a stateful " +
          "aggregate into a stateless semi join (the naive stream-static " +
          "shape is the supported one)"
      // hash safety only gates the NON-implied two-phase (the verify
      // topology joins HASHED prefixes); the implied arrays_overlap
      // path joins raw elements, so floats are never its disqualifier
      // — blaming them would send the user bit-casting to no effect
      else if (!p.implied && !hashSafeElem(p.a))
        "float/double elements: xxhash64 and SQL equality disagree on " +
          "NaN families and signed zeros — quantize or bit-cast the " +
          "elements to integers first"
      else
        s"${jt.sql} needs a STABLE rowid (no limits/samples below the " +
          "join input) and cheap scalar remaining conjuncts; one of " +
          "those is missing"
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = RewriteSupport
      .activeConf(ScaleGuards.OverlapJoinRewriteKey)
      .forall(!_.equalsIgnoreCase("false"))
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), _)
          if (jt == Inner || jt == Cross) && j.resolved =>
        val cs = conjuncts(cond)
        if (hasEquiBetween(cs, l, r)) j
        else rewriteOverlap(j, cs)
          .orElse(rewriteMembership(j, cs))
          .getOrElse { logStandDown(j, standDownReasons(cs, l, r)); j }
      case j @ Join(l, r, jt, Some(cond), _)
          if (jt == LeftSemi || jt == LeftAnti) && j.resolved =>
        val cs = conjuncts(cond)
        if (hasEquiBetween(cs, l, r)) j
        else rewriteSemiOverlap(j, cs)
          .orElse(rewriteSemiMembership(j, cs))
          .getOrElse {
            val gate = standDownReasons(cs, l, r)
            logStandDown(j,
              if (gate.nonEmpty) gate else semiStandDownReasons(cs, l, r, jt))
            j
          }
    }
  }

  /** First overlap conjunct that orients across the two sides, with
    * oriented (a = left side, b = right side) array expressions — the
    * prefix bounds are symmetric, so orientation swap is free. */
  private def orientedOverlap(cs: Seq[Expression],
      l: LogicalPlan, r: LogicalPlan): Option[OverlapPred] =
    overlapConjuncts(cs).iterator.flatMap { p =>
      if (atomicElem(p.a) && atomicElem(p.b) && sameElemType(p.a, p.b))
        oriented(p.a, p.b, l, r).map { case (a, b) => p.copy(a = a, b = b) }
      else None
    }.nextOption()

  /** [[ScaleGuards.OverlapPreflightKey]] = warn: on rewrite fire, run
    * the d31 hot-element audit over the join's own children and log the
    * result — "diagnosed by default" instead of "diagnosable on
    * request". Orchestration (conf gate, streaming skip, boxed BIGINT
    * reads, best-effort catch) is [[RewriteSupport.logPreflight]],
    * shared with the Hamming rule. */
  private def maybePreflight(l: LogicalPlan, r: LogicalPlan,
      p: OverlapPred): Unit = {
    // >=-Jaccard fires withEmptyEmptyBranch — |E_l|·|E_r| rows of
    // REQUIRED output the witnessed count cannot see; price them
    val eeCols =
      if (p.jaccardOrEqual)
        Seq("empty_empty_rows" -> true, "empty_share_bp" -> false)
      else Nil
    // sampled estimator mode: explicit sampleFraction conf wins; unset,
    // the stats floor auto-engages sampling on big children
    // (ScaleGuards.effectivePreflightSample — the 100 TB default). The
    // audit line gains sample_fraction=f provenance either way, so a
    // warn/abort read off an estimate is never mistaken for an exact
    // count
    val sample = ScaleGuards.effectivePreflightSample(
      ScaleGuards.OverlapPreflightSampleKey,
      ScaleGuards.OverlapPreflightAutoSampleMinBytesKey, l, r)
    val sampleCols = ScaleGuards.sampleProvenanceCols(sample)
    RewriteSupport.logPreflight(spark, ScaleGuards.OverlapPreflightKey,
      "overlap-join rewrite", l, r,
      Seq("est_candidate_rows" -> true) ++ eeCols ++ Seq(
        "worst_element" -> false, "max_element_rows" -> true,
        "max_share_bp" -> false, "diagnosis" -> false) ++ sampleCols,
      logWarning(_)) {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      graft.operators.SkewTools.overlapJoinPreflight(
        ColumnBridge.dataFrame(spark, l), ColumnBridge.column(p.a),
        ColumnBridge.dataFrame(spark, r), ColumnBridge.column(p.b),
        minOverlap = if (p.jaccardTau.isDefined) 1 else p.minOverlap,
        includeEmptyEmpty = p.jaccardOrEqual,
        sampleFraction = sample.getOrElse(1.0))
    }
  }

  /** `arrays_overlap(a, b)` / intersect-size threshold / Jaccard
    * (strict and `>=`), inner/cross. */
  private def rewriteOverlap(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, _, _, _) = (j: @unchecked)
    orientedOverlap(cs, l, r).map { p =>
      maybePreflight(l, r, p)
      val twoPhase =
        if (!l.isStreaming && !r.isStreaming && hashSafeElem(p.a)
            && bigEnoughForTwoPhase(l, r))
          twoPhaseInner(j, cs, p)
        else None
      val witnessed = twoPhase.getOrElse(inPlaceInner(j, cs, p))
      if (p.jaccardOrEqual) withEmptyEmptyBranch(j, cs, p, witnessed)
      else witnessed
    }
  }

  /** The `>=` Jaccard spelling's second branch: 0 >= τ·0 holds for
    * every τ, so EVERY empty-array × empty-array pair qualifies with
    * no shared-element witness — the reason this spelling used to
    * stand down entirely (the witnessed topology cannot find them).
    * The full result is therefore (witnessed two-phase) UNION (cross
    * of the two empty-array subsets). The cross is semantically
    * REQUIRED output — |E_l|·|E_r| rows exist in the naive answer —
    * and E is tiny in any real corpus (documents with an empty
    * element set); the BROADCAST hint keeps it a
    * BroadcastNestedLoopJoin rather than a CartesianProductExec. The
    * Jaccard conjunct itself is implied TRUE by the two size-0 filters
    * and is DROPPED from the cross's condition (also what keeps this
    * rule a fixed point — without an overlap-family conjunct the new
    * join never re-fires it); every other conjunct re-applies. */
  private def withEmptyEmptyBranch(j: Join, cs: Seq[Expression],
      p: OverlapPred, witnessed: LogicalPlan): LogicalPlan = {
    val Join(l, r, _, _, _) = (j: @unchecked)
    def empties(side: LogicalPlan, arr: Expression) =
      Filter(EqualTo(Size(arr, legacySizeOfNull = false), Literal(0)), side)
    val rest = cs.filterNot(_ eq p.conj)
    val cross = Join(empties(l, p.a), empties(r, p.b), Inner,
      rest.reduceOption(And),
      JoinHint(Some(HintInfo(Some(BROADCAST))), None))
    // fresh exprIds on the second branch so the union's children stay
    // distinguishable to downstream rules
    val fresh = Project(
      j.output.map(at => Alias(at, at.name)()), cross)
    Union(Seq(witnessed, fresh))
  }

  /** IN-PLACE topology: explode both sides (prefix-sliced when the
    * threshold admits it — the pin element, being the MINIMUM common
    * element, is always inside both prefixes, see
    * [[RewriteSupport.prefixElems]]), equi-join on the element, pin to
    * the minimum non-null common element (exactly-once per qualifying
    * pair). */
  private def inPlaceInner(j: Join, cs: Seq[Expression],
      p: OverlapPred): LogicalPlan = {
    val Join(l, r, _, _, hint) = (j: @unchecked)
    val (a, b) = (p.a, p.b)
    val elemType = a.dataType.asInstanceOf[ArrayType].elementType
    val ea = AttributeReference("graft_elem_l", elemType)()
    val eb = AttributeReference("graft_elem_r", elemType)()
    val genL = Generate(Explode(candidateElems(a, p, hashed = false)), Nil,
      outer = false, None, Seq(ea), l)
    val genR = Generate(Explode(candidateElems(b, p, hashed = false)), Nil,
      outer = false, None, Seq(eb), r)
    val firstCommon = ArrayMin(ArrayIntersect(a, b))
    // re-apply the original conjuncts, minus the overlap predicate
    // itself when the equi-match implies it (the chosen conjunct, plus
    // any duplicate arrays_overlap spelling of the same pair)
    val reapplied =
      if (p.implied)
        cs.filterNot { x =>
          (x eq p.conj) || (x match {
            case ArraysOverlap(q, w) =>
              (q == a && w == b) || (q == b && w == a)
            case _ => false
          })
        }
      else cs
    val full = (Seq(EqualTo(ea, eb),
      EqualTo(ea, firstCommon)) ++ reapplied).reduce(And)
    Project(j.output,
      Join(genL, genR, Inner, Some(full), selfJoinHint(l, r, hint)))
  }

  /** Exact, fast evaluation twin of `arrays_overlap(a, b)` for the
    * re-check slot: `size(array_intersect(<non-null a>, b)) >= 1`.
    * Identical three-valued semantics — null elements are filtered off
    * `a` first so a shared null never counts (arrays_overlap's
    * non-null-witness contract), and a null array yields a null size,
    * which the Filter rejects exactly as it rejects arrays_overlap's
    * NULL. Why not re-apply arrays_overlap itself: its non-primitive
    * path is pairwise O(n·m) comparison (measured ~2.2 ms per 297×51
    * string-array pair), while array_intersect builds a hash set
    * (~4× faster on the same inputs). */
  private def fastOverlapCheck(a: Expression, b: Expression): Expression = {
    val aNonNull = a.dataType match {
      case ArrayType(et, true) =>
        val v = NamedLambdaVariable("graft_nn", et, nullable = true)
        ArrayFilter(a, LambdaFunction(IsNotNull(v), Seq(v)))
      case _ => a
    }
    GreaterThanOrEqual(
      Size(ArrayIntersect(aNonNull, b), legacySizeOfNull = false),
      Literal(1))
  }

  /** Slim candidate side shared by EVERY two-phase topology (hashed
    * inner/verify, raw-witness semi, membership): project (keep
    * columns, aliased scalar-conjunct columns, array refs), explode the
    * candidate-element expression, return (plan, element attr,
    * original→alias substitution map for the carried conjuncts).
    *
    * The elements expression feeds Explode INLINE, never through an
    * alias: InferFiltersFromGenerate only infers size / isnotnull
    * filters over Attribute generator inputs (SPARK-36715), and
    * predicate pushdown would substitute an alias into those filters
    * and re-evaluate the whole shingling expression per row below the
    * explode — measured as 4× the entire query's runtime on d27 before
    * this shape. */
  private def slimSide(base: LogicalPlan, keep: Seq[Attribute],
      side: LogicalPlan, carried: Seq[Expression], elems: Expression,
      elemName: String, elemType: DataType, elemNullable: Boolean)
      : (LogicalPlan, Attribute, Map[Attribute, Attribute]) = {
    val needed = carried.flatMap(_.references).distinct
      .filter(side.outputSet.contains)
    val aliased = needed.map(at => at -> Alias(at, at.name)())
    val arrRefs = elems.references.toSeq
    val kept = keep ++ aliased.map(_._2)
    val proj = Project(kept ++ arrRefs, base)
    val eh = AttributeReference(elemName, elemType,
      nullable = elemNullable)()
    val gen = Generate(Explode(elems),
      unrequiredChildIndex = kept.size until proj.output.size,
      outer = false, None, Seq(eh), proj)
    (gen, eh, aliased.map { case (at, al) => at -> al.toAttribute }.toMap)
  }

  /** [[slimSide]] with the HASHED candidate keys (8-byte xxhash64
    * elements, prefix-sliced when the threshold admits it) — the
    * two-phase inner/verify shape. */
  private def slimHashedSide(base: LogicalPlan, prid: Attribute,
      arr: Expression, side: LogicalPlan, elemName: String,
      carried: Seq[Expression], p: OverlapPred)
      : (LogicalPlan, Attribute, Map[Attribute, Attribute]) =
    slimSide(base, Seq(prid), side, carried,
      candidateElems(arr, p, hashed = true), elemName, LongType,
      elemNullable = false)

  /** TWO-PHASE topology: slim hashed candidate pair generation
    * (prefix-sliced when the threshold admits it) + distinct + rowid
    * back-joins + raw predicate re-application. */
  private def twoPhaseInner(j: Join, cs: Seq[Expression],
      p: OverlapPred): Option[LogicalPlan] = {
    val Join(l, r, _, _, hint) = (j: @unchecked)
    val (chosen, a, b, implied) = (p.conj, p.a, p.b, p.implied)
    for {
      (lBack, ridL) <- withStableRowId(l, "graft_rid_l")
      (rBack, ridR) <- withStableRowId(r, "graft_rid_r")
      (lNarrow, pridL) <- withStableRowId(l, "graft_prid_l")
      (rNarrow, pridR) <- withStableRowId(r, "graft_prid_r")
    } yield {
      val rest = cs.filterNot(_ eq chosen)
      // scalar-only conjuncts prune candidates inside the slim join;
      // everything else (the overlap itself included) re-applies raw
      // after the back-joins, which is what makes hashing exact
      val (cheap, heavy) = rest.partition(c =>
        c.deterministic && c.references.forall(at => scalarType(at.dataType)))
      val (nL, ehL, mapL) =
        slimHashedSide(lNarrow, pridL, a, l, "graft_elem_l", cheap, p)
      val (nR, ehR, mapR) =
        slimHashedSide(rNarrow, pridR, b, r, "graft_elem_r", cheap, p)
      val subst = mapL ++ mapR
      val cheapSub = cheap.map(_.transform {
        case at: Attribute if subst.contains(at) => subst(at)
      })
      val cand = Join(nL, nR, Inner,
        Some((EqualTo(ehL, ehR) +: cheapSub).reduce(And)),
        selfJoinHint(l, r, hint))
      val pairs = Aggregate(Seq(pridL, pridR), Seq(pridL, pridR), cand)
      val back1 = Join(lBack, pairs, Inner,
        Some(EqualTo(ridL, pridL)), JoinHint.NONE)
      val back2 = Join(back1, rBack, Inner,
        Some(EqualTo(pridR, ridR)), JoinHint.NONE)
      // the plain arrays_overlap spelling re-checks through the exact
      // intersect twin (hash-set path); threshold spellings re-apply
      // their own predicate raw, which subsumes the overlap witness
      val recheck = if (implied) fastOverlapCheck(a, b) else chosen
      val post = (recheck +: heavy).reduce(And)
      Project(j.output, Filter(post, back2))
    }
  }

  /** `array_contains(a, x)` with `a` and `x` on opposite sides — the
    * tag-lookup membership join — → explode the ARRAY side's distinct
    * elements and equi-join the element against the scalar. No pin
    * needed: at most one distinct element equals `x`, so each
    * qualifying pair emits exactly once by construction. Null-exact:
    * `array_contains` is TRUE iff a non-null element equals a non-null
    * `x`, which is precisely what the equi-join matches (the implied
    * conjunct is dropped; other conjuncts re-applied). The first
    * candidate conjunct that orients across the sides wins. */
  private def membershipConjunct(cs: Seq[Expression],
      l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] =
    cs.iterator.flatMap {
      case c @ ArrayContains(arr, x)
          if atomicElem(arr)
            && x.dataType ==
              arr.dataType.asInstanceOf[ArrayType].elementType
            && arr.references.nonEmpty && x.references.nonEmpty =>
        if (arr.references.subsetOf(l.outputSet)
            && x.references.subsetOf(r.outputSet))
          Some((c, arr, x, true)) // array on the left
        else if (arr.references.subsetOf(r.outputSet)
            && x.references.subsetOf(l.outputSet))
          Some((c, arr, x, false)) // array on the right
        else None
      case _ => None
    }.nextOption()

  private def rewriteMembership(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, _, _, hint) = (j: @unchecked)
    membershipConjunct(cs, l, r).map { case (c, arr, x, arrayOnLeft) =>
      val rest = cs.filterNot(_ eq c)
      val elemType = arr.dataType.asInstanceOf[ArrayType].elementType
      val ea = AttributeReference("graft_member_elem", elemType)()
      val newJoin =
        if (arrayOnLeft)
          Join(Generate(Explode(ArrayDistinct(arr)), Nil,
            outer = false, None, Seq(ea), l), r, Inner,
            Some((EqualTo(ea, x) +: rest).reduce(And)), hint)
        else
          Join(l, Generate(Explode(ArrayDistinct(arr)), Nil,
            outer = false, None, Seq(ea), r), Inner,
            Some((EqualTo(ea, x) +: rest).reduce(And)), hint)
      Project(j.output, newJoin)
    }
  }

  // ---------------------------------------------------------------- semi

  /** LeftSemi/LeftAnti overlap/threshold/Jaccard: the decontamination
    * shapes (semi = "report the contaminated rows", anti = "keep the
    * clean corpus"). Both reduce to the same matching-rowid set; the
    * back join's type decides which side of it survives. The implied
    * spelling probes witness equality directly ([[twoPhaseSemi]]);
    * threshold/Jaccard spellings re-verify candidate pairs against the
    * raw predicate first ([[twoPhaseSemiVerify]] — a shared element is
    * only a witness there, not a verdict). LeftAnti has no in-place
    * fallback: its collapse cannot be expressed as a group-by over
    * survivors, so without a stable rowid the rule stands down (the
    * naive plan stays, correct but unscalable). */
  private def rewriteSemiOverlap(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, jt, _, _) = (j: @unchecked)
    // the `>=` Jaccard spelling admits witness-less empty-empty
    // partners: a semi/anti built from witnessed matches alone would
    // drop (semi) or wrongly keep (anti) every empty left row when the
    // right side contains any qualifying empty array. The rowid
    // topology handles it — [[twoPhaseSemiVerify]] unions the
    // empty-matched rowids into the matched set before the back join —
    // so the spelling fires there (regardless of input size: the
    // in-place collapse below cannot see empty-empty matches, so there
    // is no small-input form and the alternative is the naive
    // nested-loop); without a stable rowid it still stands down.
    orientedOverlap(cs, l, r).flatMap { p =>
      val rest = cs.filterNot(_ eq p.conj)
      val restCheap = rest.forall(c =>
        c.deterministic && c.references.forall(at => scalarType(at.dataType)))
      val twoPhase =
        if (p.implied && restCheap && !l.isStreaming && !r.isStreaming
            && (jt == LeftAnti || bigEnoughForTwoPhase(l, r)))
          twoPhaseSemi(j, rest, p.a, p.b)
        else if (!p.implied && restCheap && !l.isStreaming && !r.isStreaming
            && hashSafeElem(p.a)
            && (jt == LeftAnti || p.jaccardOrEqual
              || bigEnoughForTwoPhase(l, r)))
          twoPhaseSemiVerify(j, rest, p)
        else None
      // the in-place collapse is a group-by over the exploded left
      // side — on a streaming plan that would smuggle a stateful
      // aggregate into a stateless semi join, so it stands down there
      // (the naive stream-static nested-loop semi stays, which is the
      // supported shape); for `>=`-Jaccard it can never fire (empty
      // arrays explode nothing, so empty-empty matches are invisible
      // to it)
      val fired = twoPhase.orElse(
        if (jt == LeftSemi && !j.isStreaming && !p.jaccardOrEqual)
          inPlaceSemi(j, cs, p)
        else None)
      if (fired.isDefined) maybePreflight(l, r, p)
      fired
    }
  }

  /** Two-phase semi/anti for the NON-implied spellings (intersect-size
    * threshold, strict Jaccard) — the keep-the-clean-corpus shape
    * `corpus.join(banned, size(array_intersect(g, bg)) >= c,
    * "left_anti")`, which previously stood down entirely for anti (the
    * naive plan is a nested-loop cartesian). A shared element is only a
    * WITNESS here, not a verdict, so candidate pairs from the slim
    * hashed-prefix join are re-verified by the raw predicate on
    * back-joined full rows, then collapsed to the matched left-rowid
    * set; the final join's type (semi keeps it, anti keeps its
    * complement) decides survival. Payloads cross the wire once per
    * row into the verify join — never once per element. */
  private def twoPhaseSemiVerify(j: Join, rest: Seq[Expression],
      p: OverlapPred): Option[LogicalPlan] = {
    val Join(l, r, jt, _, hint) = (j: @unchecked)
    for {
      (lBack, ridL) <- withStableRowId(l, "graft_rid_l")
      (lNarrow, pridL) <- withStableRowId(l, "graft_prid_l")
      (rNarrow, pridR) <- withStableRowId(r, "graft_prid_r")
      (lVer, vridL) <- withStableRowId(l, "graft_vrid_l")
      (rVer, vridR) <- withStableRowId(r, "graft_vrid_r")
    } yield {
      val (nL, ehL, mapL) =
        slimHashedSide(lNarrow, pridL, p.a, l, "graft_elem_l", rest, p)
      val (nR, ehR, mapR) =
        slimHashedSide(rNarrow, pridR, p.b, r, "graft_elem_r", rest, p)
      val subst = mapL ++ mapR
      val restSub = rest.map(_.transform {
        case at: Attribute if subst.contains(at) => subst(at)
      })
      val cand = Join(nL, nR, Inner,
        Some((EqualTo(ehL, ehR) +: restSub).reduce(And)),
        selfJoinHint(l, r, hint))
      val pairs = Aggregate(Seq(pridL, pridR), Seq(pridL, pridR), cand)
      val withL = Join(pairs, lVer, Inner,
        Some(EqualTo(pridL, vridL)), JoinHint.NONE)
      val withLR = Join(withL, rVer, Inner,
        Some(EqualTo(pridR, vridR)), JoinHint.NONE)
      val verified = Filter(p.conj, withLR)
      val witnessedIds = Aggregate(Seq(pridL), Seq(pridL), verified)
      // `>=`-Jaccard admits witness-less empty-empty partners (0 >= τ·0
      // for every τ): an empty-array left row matches iff SOME
      // empty-array right row satisfies the remaining conjuncts — a
      // LeftSemi of the two tiny size-0-filtered subsets (broadcast; a
      // condition-less one is the FailCartesianProducts-exempt
      // broadcast shape, as in [[withEmptyEmptyBranch]]). Its rowids
      // UNION into the matched set; the back join's type then decides
      // survival for semi and anti alike.
      val matched =
        if (!p.jaccardOrEqual) witnessedIds
        else {
          val (lEmpty, erid) = withStableRowId(l, "graft_erid_l")
            .getOrElse(sys.error("unreachable: l yielded a rowid above"))
          val emptyL = Filter(
            EqualTo(Size(p.a, legacySizeOfNull = false), Literal(0)), lEmpty)
          val emptyR = Filter(
            EqualTo(Size(p.b, legacySizeOfNull = false), Literal(0)), r)
          val emptySemi = Join(emptyL, emptyR, LeftSemi,
            rest.reduceOption(And),
            JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
          val emptyIds = Project(
            Seq(Alias(erid, "graft_eprid_l")()), emptySemi)
          Aggregate(Seq(pridL), Seq(pridL),
            Union(Seq(witnessedIds, emptyIds)))
        }
      val back = Join(lBack, matched, jt,
        Some(EqualTo(ridL, pridL)), JoinHint.NONE)
      Project(j.output, back)
    }
  }

  /** Slim semi pair-probe: explode `(rowid, element)` on the left and
    * `element` (+ scalar conjunct columns) on the right, LeftSemi on
    * RAW element equality — a matched non-null element IS the overlap
    * witness, so this is exact with no re-check — collapse to distinct
    * rowids, LeftSemi the tagged left side against them. The left
    * payload crosses the wire once per row, never per element. */
  private def twoPhaseSemi(j: Join, rest: Seq[Expression],
      a: Expression, b: Expression): Option[LogicalPlan] = {
    val Join(l, r, jt, _, hint) = (j: @unchecked)
    for {
      (lBack, ridL) <- withStableRowId(l, "graft_rid_l")
      (lNarrow, pridL) <- withStableRowId(l, "graft_prid_l")
    } yield {
      val elemType = a.dataType.asInstanceOf[ArrayType].elementType
      // raw distinct elements (witness equality must be exact, no
      // re-check) through the shared slimSide scaffold
      val (nL, eaL, mapL) = slimSide(lNarrow, Seq(pridL), l, rest,
        distinctElems(a), "graft_elem_l", elemType, elemNullable = true)
      val (nR, eaR, mapR) = slimSide(r, Nil, r, rest,
        distinctElems(b), "graft_elem_r", elemType, elemNullable = true)
      val subst = mapL ++ mapR
      val restSub = rest.map(_.transform {
        case at: Attribute if subst.contains(at) => subst(at)
      })
      val semiCand = Join(nL, nR, LeftSemi,
        Some((EqualTo(eaL, eaR) +: restSub).reduce(And)),
        selfJoinHint(l, r, hint))
      val rids = Aggregate(Seq(pridL), Seq(pridL), semiCand)
      // semi keeps the matching rowids, anti keeps their complement —
      // the rid set itself is identical
      val back = Join(lBack, rids, jt,
        Some(EqualTo(ridL, pridL)), JoinHint.NONE)
      Project(j.output, back)
    }
  }

  /** Single-instantiation semi: tag left rows with a plain unique id
    * (no order-stability needed — the tagged plan is evaluated once),
    * explode, LeftSemi with the full predicate (threshold spellings
    * re-applied raw), then collapse each row's surviving copies via
    * group-on-srid (payloads ride First — see
    * [[RewriteSupport.collapseBySrid]]). */
  private def inPlaceSemi(j: Join, cs: Seq[Expression],
      p: OverlapPred): Option[LogicalPlan] = {
    val Join(l, r, _, _, hint) = (j: @unchecked)
    val (a, b) = (p.a, p.b)
    val elemType = a.dataType.asInstanceOf[ArrayType].elementType
    val srid = Alias(MonotonicallyIncreasingID(), "graft_srid")()
    val tagged = Project(l.output :+ srid, l)
    val ea = AttributeReference("graft_elem_l", elemType)()
    val eb = AttributeReference("graft_elem_r", elemType)()
    val genL = Generate(Explode(candidateElems(a, p, hashed = false)), Nil,
      outer = false, None, Seq(ea), tagged)
    val genR = Generate(Explode(candidateElems(b, p, hashed = false)), Nil,
      outer = false, None, Seq(eb), r)
    val reapplied = if (p.implied) cs.filterNot(_ eq p.conj) else cs
    val semi = Join(genL, genR, LeftSemi,
      Some((EqualTo(ea, eb) +: reapplied).reduce(And)),
      selfJoinHint(l, r, hint))
    val collapsed = collapseBySrid(srid.toAttribute, l.output, semi)
    Some(Project(j.output, collapsed))
  }

  /** LeftSemi membership. Array on the RIGHT (`probe ⋉ tags`): the left
    * side stays unexploded — explode the right side's distinct elements
    * and LeftSemi on element = probe; semi semantics already emit each
    * left row once, so no tagging or collapse at all. Array on the
    * LEFT: explode-tag-collapse, as the overlap semi. */
  private def rewriteSemiMembership(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, jt, _, hint) = (j: @unchecked)
    membershipConjunct(cs, l, r).flatMap { case (c, arr, x, arrayOnLeft) =>
      val rest = cs.filterNot(_ eq c)
      val elemType = arr.dataType.asInstanceOf[ArrayType].elementType
      val ea = AttributeReference("graft_member_elem", elemType)()
      if (!arrayOnLeft) {
        // probe side stays unexploded: semi AND anti both exact (a null
        // probe or null-only tags never equi-match, exactly the rows
        // array_contains never passes TRUE for)
        val genR = Generate(Explode(ArrayDistinct(arr)), Nil,
          outer = false, None, Seq(ea), r)
        Some(Project(j.output, Join(l, genR, jt,
          Some((EqualTo(x, ea) +: rest).reduce(And)), hint)))
      } else {
        val twoPhase =
          if (!l.isStreaming && !r.isStreaming
              && (jt == LeftAnti || bigEnoughForTwoPhase(l, r)))
            twoPhaseSemiMembership(j, rest, arr, x)
          else None
        twoPhase.orElse {
          // same streaming stand-down as inPlaceSemi: the collapse is
          // a group-by over the exploded left side
          if (jt == LeftAnti || j.isStreaming) None
          else {
            val srid = Alias(MonotonicallyIncreasingID(), "graft_srid")()
            val tagged = Project(l.output :+ srid, l)
            val genL = Generate(Explode(ArrayDistinct(arr)), Nil,
              outer = false, None, Seq(ea), tagged)
            val semi = Join(genL, r, LeftSemi,
              Some((EqualTo(ea, x) +: rest).reduce(And)), hint)
            val collapsed = collapseBySrid(srid.toAttribute, l.output, semi)
            Some(Project(j.output, collapsed))
          }
        }
      }
    }
  }

  /** Two-phase semi/anti MEMBERSHIP with the array on the left — the
    * quarantine shapes `docs ⋉ banned_tags ON array_contains(tags, t)`
    * and its anti twin "keep the docs with NO banned tag" (which
    * previously stood down entirely). Membership witness equality IS
    * the verdict (`array_contains` is TRUE iff some non-null element
    * equals the non-null probe), so no re-verification is needed:
    * explode `(rowid, element)` slim rows, LeftSemi against the intact
    * probe side on element = probe (+ remaining conjuncts — their
    * left-side references must be scalar to ride the narrow
    * projection; the probe side is fully present), collapse to
    * distinct rowids, and semi/anti the tagged left side against them.
    * The left payload crosses the wire once per row, never per tag. */
  private def twoPhaseSemiMembership(j: Join, rest: Seq[Expression],
      arr: Expression, x: Expression): Option[LogicalPlan] = {
    val Join(l, r, jt, _, hint) = (j: @unchecked)
    val lRefsScalar = rest.forall(c => c.deterministic
      && c.references.filter(l.outputSet.contains)
        .forall(at => scalarType(at.dataType)))
    if (!lRefsScalar) None
    else for {
      (lBack, ridL) <- withStableRowId(l, "graft_rid_l")
      (lNarrow, pridL) <- withStableRowId(l, "graft_prid_l")
    } yield {
      val elemType = arr.dataType.asInstanceOf[ArrayType].elementType
      val (gen, ea, subst) = slimSide(lNarrow, Seq(pridL), l, rest,
        distinctElems(arr), "graft_member_elem", elemType,
        elemNullable = true)
      val restSub = rest.map(_.transform {
        case at: Attribute if subst.contains(at) => subst(at)
      })
      val semiCand = Join(gen, r, LeftSemi,
        Some((EqualTo(ea, x) +: restSub).reduce(And)), hint)
      val rids = Aggregate(Seq(pridL), Seq(pridL), semiCand)
      val back = Join(lBack, rids, jt,
        Some(EqualTo(ridL, pridL)), JoinHint.NONE)
      Project(j.output, back)
    }
  }
}

private[plans] object SetOverlapJoinRewrite {
  /** A recognized overlap-family conjunct. `implied = true` marks the
    * plain `arrays_overlap` spelling, whose re-application the in-place
    * pin makes redundant (a matched non-null shared element IS the
    * overlap witness); threshold/Jaccard spellings are NOT implied and
    * are always re-applied raw. `minOverlap` is the statically-known
    * lower bound c on |set(a) ∩ set(b)| for qualifying pairs — the
    * SSJoin prefix filter explodes only (size − c + 1) elements per row
    * when c ≥ 2. `jaccardTau` carries the strict-Jaccard threshold,
    * whose per-row bound is dynamic (c_row = floor(τ·size) + 1 for the
    * strict spelling, max(ceil(τ·size), 1) when `jaccardOrEqual` — the
    * `>=` spelling, whose WITNESSED pairs this bound covers while the
    * empty-empty pairs it also admits come from a separate union
    * branch, see [[rewriteOverlap]]). */
  /** `jaccardSlop` = the τ literal was a DECIMAL (a pure-SQL `0.8`)
    * whose predicate arithmetic is exact while the bound runs in
    * double: the bound subtracts one extra element (c_row − 1) so a
    * one-ulp overshoot of ceil/floor can never shorten a prefix a
    * qualifying pair needs — the raw predicate re-check keeps the
    * result exact, the prefix is merely one element longer. Double τ
    * literals need no slop: the bound runs in the predicate's own
    * arithmetic. */
  private[plans] final case class OverlapPred(conj: Expression,
      a: Expression, b: Expression, implied: Boolean, minOverlap: Int,
      jaccardTau: Option[Double], jaccardOrEqual: Boolean = false,
      jaccardSlop: Boolean = false)

}
