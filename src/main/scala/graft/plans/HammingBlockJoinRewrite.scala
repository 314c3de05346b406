package graft.plans

import graft.functions.HammingDistance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact pigeonhole rewrite for Hamming-threshold joins (SURVEY §7.2's
  * "custom Rule" tier, the whole-operator optimization beside the
  * engine's custom Expressions): a join whose only cross-side predicate
  * is `hamming64(a, b) <= k` would plan as a nested-loop cartesian —
  * |L|·|R| fingerprint comparisons, the shape that never finishes at
  * 100 TB. But if two 64-bit codes differ in ≤ k bits, then splitting
  * the code into k+1 disjoint blocks forces AT LEAST ONE block to be
  * bit-identical (pigeonhole), so the join is EXACTLY equivalent to an
  * equi-join on block values — each side posexplodes its k+1 (index,
  * block) rows and the join keys on (index, block), a plain shuffled
  * hash join costing O(block collisions). Every qualifying pair is
  * emitted exactly once: the match at index i additionally requires
  * blocks 0..i−1 to DIFFER, so a pair surfaces only from its first
  * matching block (no dedup aggregate, so row multiplicities are
  * preserved verbatim — the rewrite is a strict plan-level identity,
  * HammingRewriteSpec proves result equality).
  *
  * SELF-CONTAINED single-scan shape (round 7; was a Union of k+1
  * two-sided joins before): the union form re-planned the same children
  * under every branch, so each input was scanned — and its fingerprint
  * expressions recomputed — k+1 times unless the caller happened to
  * `.cache()` first. The posexplode form reads each input ONCE,
  * replicates rows (k+1)× inside the exchange, and runs ONE join — no
  * caching contract leaks to the user, and AQE sees a single join to
  * skew-split. HammingRewriteSpec pins single-scan-per-side.
  *
  * This automates the d04 `simhashNearDups` topology for ANY user query
  * on a [[graft.functions.GraftExtensions]] session — write the naive
  * predicate, get the scalable plan. Fires only when: the join is
  * inner/cross, a `hamming64 ≤ k` conjunct (any comparison spelling)
  * spans the two sides with k ≤ 15 (beyond that, 4-bit blocks collide
  * too often to help), and no equi-conjunct already links the sides
  * (an existing equi-join is already O(collisions); this also makes
  * the rewrite a fixed point — its own output joins on block equality).
  * Default ON; disable with `spark.graft.hammingBlockJoinRewrite=false`.
  */
class HammingBlockJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The `hamming64(a,b) ≤ k` conjunct, in any comparison spelling. */
  private def hammingBound(cs: Seq[Expression])
      : Option[(Expression, Expression, Int)] =
    cs.collectFirst {
      case LessThanOrEqual(HammingDistance(a, b), Literal(k: Int, IntegerType)) =>
        (a, b, k)
      case LessThan(HammingDistance(a, b), Literal(k: Int, IntegerType)) =>
        (a, b, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), HammingDistance(a, b)) =>
        (a, b, k)
      case GreaterThan(Literal(k: Int, IntegerType), HammingDistance(a, b)) =>
        (a, b, k - 1)
    }

  private def blockOf(x: Expression, offset: Int, width: Int): Expression = {
    val shifted =
      if (offset == 0) x else ShiftRightUnsigned(x, Literal(offset))
    if (width >= 64) shifted
    else BitwiseAnd(shifted, Literal((1L << width) - 1L))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption(ScaleGuards.HammingBlockJoinRewriteKey)
      .forall(!_.equalsIgnoreCase("false"))
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), hint)
          if (jt == Inner || jt == Cross) && j.resolved =>
        val cs = RewriteSupport.conjuncts(cond)
        hammingBound(cs) match {
          case Some((ax, bx, k))
              if k >= 0 && k <= 15 && ax.dataType == LongType
                && bx.dataType == LongType
                && !RewriteSupport.hasEquiBetween(cs, l, r) =>
            RewriteSupport.oriented(ax, bx, l, r) match {
              case Some((a, b)) =>
                val n = k + 1
                val base = 64 / n
                val rem = 64 % n
                val widths = (0 until n).map(i =>
                  base + (if (i < rem) 1 else 0))
                val offsets = widths.scanLeft(0)(_ + _)
                def blocksArr(x: Expression) = CreateArray(
                  (0 until n).map(i => blockOf(x, offsets(i), widths(i))))
                val posL = AttributeReference("graft_bidx_l", IntegerType,
                  nullable = false)()
                val valL = AttributeReference("graft_bval_l", LongType)()
                val posR = AttributeReference("graft_bidx_r", IntegerType,
                  nullable = false)()
                val valR = AttributeReference("graft_bval_r", LongType)()
                val genL = Generate(PosExplode(blocksArr(a)), Nil,
                  outer = false, None, Seq(posL, valL), l)
                val genR = Generate(PosExplode(blocksArr(b)), Nil,
                  outer = false, None, Seq(posR, valR), r)
                // first-match-only: blocks before the matched index differ
                // (for p ≥ index the conjunct is vacuously true)
                val priorDiffer = (0 until n - 1).map(p =>
                  Or(GreaterThanOrEqual(Literal(p), posL),
                    Not(EqualTo(blockOf(a, offsets(p), widths(p)),
                      blockOf(b, offsets(p), widths(p))))))
                val full = (Seq(EqualTo(posL, posR), EqualTo(valL, valR))
                  ++ priorDiffer :+ cond).reduce(And)
                Project(j.output,
                  Join(genL, genR, Inner, Some(full),
                    RewriteSupport.selfJoinHint(l, r, hint)))
              case None => j
            }
          case _ => j
        }
    }
  }
}

/** Shared pattern helpers for the theta-join rewrite rules. */
private[plans] object RewriteSupport {
  import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, JoinHint, SHUFFLE_HASH}

  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** SELF-joins (canonically identical children — d25's fingerprint
    * self-join is the archetype) get a SHUFFLE_HASH hint: both exploded
    * sides then plan the SAME hash exchange, which exchange/stage reuse
    * deduplicates — the expensive upstream pipeline (fingerprinting,
    * shingling) runs ONCE and its shuffle output is read twice. A
    * broadcast join would instead re-execute the pipeline to build the
    * broadcast side (measured on d25 at sf0.1: 4.9 s broadcast vs 2.0 s
    * warm with the reused exchange — the r6 cached-union number, now
    * with no cache and no caller contract). Distinct
    * children keep the planner's choice — broadcasting a genuinely
    * small side is still right. */
  def selfJoinHint(l: LogicalPlan, r: LogicalPlan,
      hint: JoinHint): JoinHint =
    if (l.canonicalized == r.canonicalized)
      JoinHint(Some(HintInfo(Some(SHUFFLE_HASH))),
        Some(HintInfo(Some(SHUFFLE_HASH))))
    else hint

  /** Orient (a, b) as (left-side, right-side) expressions, if they split. */
  def oriented(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.nonEmpty && b.references.nonEmpty
        && a.references.subsetOf(l.outputSet)
        && b.references.subsetOf(r.outputSet)) Some((a, b))
    else if (a.references.nonEmpty && b.references.nonEmpty
        && b.references.subsetOf(l.outputSet)
        && a.references.subsetOf(r.outputSet)) Some((b, a))
    else None

  def hasEquiBetween(cs: Seq[Expression],
      l: LogicalPlan, r: LogicalPlan): Boolean =
    cs.exists {
      case EqualTo(x, y) =>
        x.references.nonEmpty && y.references.nonEmpty &&
          ((x.references.subsetOf(l.outputSet)
              && y.references.subsetOf(r.outputSet)) ||
            (y.references.subsetOf(l.outputSet)
              && x.references.subsetOf(r.outputSet)))
      case _ => false
    }
}
