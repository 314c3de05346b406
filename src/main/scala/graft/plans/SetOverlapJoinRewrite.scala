package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, MapType, StructType}

/** Exact explode rewrite for set-overlap theta joins — the companion of
  * [[HammingBlockJoinRewrite]], automating d02's group-and-expand
  * topology for naive user queries: an inner join whose only cross-side
  * predicate is `arrays_overlap(a, b)` (or an intersect-size threshold,
  * see below) plans as a nested-loop cartesian — |L|·|R| array
  * comparisons. But any qualifying pair shares at least one element
  * (the same pigeonhole identity as the Hamming blocks), so the join is
  * EXACTLY equivalent to exploding the distinct elements of each side
  * and equi-joining on the element — a plain shuffled hash join costing
  * O(element collisions).
  *
  * Every qualifying pair is emitted exactly once: the match is
  * additionally pinned to the pair's MINIMUM non-null common element
  * (`ea = array_min(array_intersect(a, b))` — array_min skips nulls),
  * so of the possibly-many shared elements exactly one produces the
  * row, with no dedup aggregate — row multiplicities are preserved
  * verbatim and the rewrite is a strict plan-level identity
  * (OverlapRewriteSpec proves result equality, nulls and duplicate
  * elements included). Null exactness mirrors `arrays_overlap`'s own
  * contract: it returns TRUE only when a non-null common element
  * exists (null-only overlap yields NULL → the pair is rejected), and
  * the exploded equi-join likewise never matches null elements.
  *
  * Accepted conjunct spellings:
  *  - `arrays_overlap(a, b)` — exact for any atomic element type,
  *    nullable elements included (per the argument above);
  *  - `size(array_intersect(a, b)) >= k` with k ≥ 1 (and the >, and
  *    reversed-literal, spellings) — here `size` COUNTS a shared null,
  *    so this form fires only when the array types are statically
  *    null-free (`containsNull = false`); the full threshold predicate
  *    is re-applied after the equi-join.
  *  - `array_contains(a, x)` with `a` and `x` on opposite sides (the
  *    tag-lookup membership join) — only the array side explodes and
  *    no dedup pin is needed (see [[rewriteMembership]]).
  *
  * Fires only when the join is inner/cross, the overlap conjunct spans
  * the two sides, the element type is atomic (orderable + joinable),
  * and no equi-conjunct already links the sides (an existing equi-join
  * is already O(collisions); this also makes the rewrite a fixed
  * point — its own output joins on element equality). Default ON;
  * disable with `spark.graft.overlapJoinRewrite=false`.
  */
class SetOverlapJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The overlap conjunct: (a, b, implied). `implied = true` marks the
    * plain `arrays_overlap` spelling, which the element equi-match plus
    * the min-element pin make REDUNDANT (a matched non-null shared
    * element IS the overlap witness) — the rewrite then drops it from
    * the re-applied condition, saving one O(|a|+|b|) set evaluation per
    * candidate match (the pin already pays one; this halves the
    * per-match array work). Threshold spellings are NOT implied and are
    * always re-applied. */
  private def overlapConjunct(cs: Seq[Expression])
      : Option[(Expression, Expression, Boolean)] = {
    def nullFree(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }
    cs.collectFirst {
      case ArraysOverlap(a, b) => (a, b, true)
      case GreaterThanOrEqual(Size(ArrayIntersect(a, b), _),
            Literal(k: Int, IntegerType))
          if k >= 1 && nullFree(a) && nullFree(b) => (a, b, false)
      case GreaterThan(Size(ArrayIntersect(a, b), _),
            Literal(k: Int, IntegerType))
          if k >= 0 && nullFree(a) && nullFree(b) => (a, b, false)
      case LessThanOrEqual(Literal(k: Int, IntegerType),
            Size(ArrayIntersect(a, b), _))
          if k >= 1 && nullFree(a) && nullFree(b) => (a, b, false)
      case LessThan(Literal(k: Int, IntegerType),
            Size(ArrayIntersect(a, b), _))
          if k >= 0 && nullFree(a) && nullFree(b) => (a, b, false)
    }
  }

  /** Scalar (non-nested) orderable element — what both the equi-join
    * keys and the `array_min` dedup pin require. */
  private def atomicElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(et, _) => et match {
      case _: ArrayType | _: MapType | _: StructType => false
      case other => RowOrdering.isOrderable(other)
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption(ScaleGuards.OverlapJoinRewriteKey)
      .forall(!_.equalsIgnoreCase("false"))
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), hint)
          if (jt == Inner || jt == Cross) && j.resolved =>
        val cs = RewriteSupport.conjuncts(cond)
        if (RewriteSupport.hasEquiBetween(cs, l, r)) j
        else rewriteOverlap(j, cs)
          .orElse(rewriteMembership(j, cs))
          .getOrElse(j)
    }
  }

  /** `arrays_overlap(a, b)` / intersect-size threshold → explode both
    * sides, equi-join on the element, pin to the minimum non-null
    * common element (exactly-once per qualifying pair). */
  private def rewriteOverlap(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, _, Some(cond), hint) = (j: @unchecked)
    overlapConjunct(cs) match {
      case Some((ax, bx, implied))
          if atomicElem(ax) && atomicElem(bx)
            && ax.dataType.asInstanceOf[ArrayType].elementType ==
              bx.dataType.asInstanceOf[ArrayType].elementType =>
        RewriteSupport.oriented(ax, bx, l, r).map { case (a, b) =>
          val elemType = a.dataType.asInstanceOf[ArrayType].elementType
          val ea = AttributeReference("graft_elem_l", elemType)()
          val eb = AttributeReference("graft_elem_r", elemType)()
          val genL = Generate(Explode(ArrayDistinct(a)), Nil,
            outer = false, None, Seq(ea), l)
          val genR = Generate(Explode(ArrayDistinct(b)), Nil,
            outer = false, None, Seq(eb), r)
          val firstCommon = ArrayMin(ArrayIntersect(a, b))
          // re-apply the original conjuncts, minus the overlap
          // predicate itself when the equi-match implies it
          val reapplied =
            if (implied)
              cs.filterNot {
                case ArraysOverlap(x, y) =>
                  (x == ax && y == bx) || (x == bx && y == ax)
                case _ => false
              }
            else cs
          val full = (Seq(EqualTo(ea, eb),
            EqualTo(ea, firstCommon)) ++ reapplied).reduce(And)
          Project(j.output,
            Join(genL, genR, Inner, Some(full),
              RewriteSupport.selfJoinHint(l, r, hint)))
        }
      case _ => None
    }
  }

  /** `array_contains(a, x)` with `a` and `x` on opposite sides — the
    * tag-lookup membership join — → explode the ARRAY side's distinct
    * elements and equi-join the element against the scalar. No pin
    * needed: at most one distinct element equals `x`, so each
    * qualifying pair emits exactly once by construction. Null-exact:
    * `array_contains` is TRUE iff a non-null element equals a non-null
    * `x`, which is precisely what the equi-join matches (the implied
    * conjunct is dropped; other conjuncts re-applied). */
  private def rewriteMembership(j: Join, cs: Seq[Expression])
      : Option[LogicalPlan] = {
    val Join(l, r, _, Some(_), hint) = (j: @unchecked)
    val found = cs.collectFirst {
      case c @ ArrayContains(arr, x)
          if atomicElem(arr)
            && x.dataType ==
              arr.dataType.asInstanceOf[ArrayType].elementType
            && arr.references.nonEmpty && x.references.nonEmpty =>
        (c, arr, x)
    }
    found.flatMap { case (c, arr, x) =>
      val rest = cs.filterNot(_ eq c)
      val elemType = arr.dataType.asInstanceOf[ArrayType].elementType
      def build(arrayOnLeft: Boolean): LogicalPlan = {
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
      if (arr.references.subsetOf(l.outputSet)
          && x.references.subsetOf(r.outputSet)) Some(build(true))
      else if (arr.references.subsetOf(r.outputSet)
          && x.references.subsetOf(l.outputSet)) Some(build(false))
      else None
    }
  }
}
