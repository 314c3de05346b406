package graft.plans

import graft.functions.HammingDistance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact pigeonhole rewrite for Hamming-threshold joins (SURVEY §7.2's
  * "custom Rule" tier, the whole-operator optimization beside the
  * engine's custom Expressions): a join whose only cross-side predicate
  * is `hamming64(a, b) <= k` would plan as a nested-loop cartesian —
  * |L|·|R| fingerprint comparisons, the shape that never finishes at
  * 100 TB. But if two 64-bit codes differ in ≤ k bits, then splitting
  * the code into k+1 disjoint blocks forces AT LEAST ONE block to be
  * bit-identical (pigeonhole), so the join is EXACTLY equivalent to a
  * union of k+1 EQUI-joins on block values — each a plain shuffled hash
  * join costing O(block collisions) — with the original predicate
  * re-applied. Every qualifying pair is emitted exactly once: branch i
  * additionally requires blocks 0..i−1 to DIFFER, so a pair surfaces
  * only from its first matching block (no dedup aggregate, so row
  * multiplicities are preserved verbatim — the rewrite is a strict
  * plan-level identity, HammingRewriteSpec proves result equality).
  *
  * This automates the d04 `simhashNearDups` topology for ANY user query
  * on a [[graft.functions.GraftExtensions]] session — write the naive
  * predicate, get the scalable plan. Fires only when: the join is
  * inner/cross, a `hamming64 ≤ k` conjunct (any comparison spelling)
  * spans the two sides with k ≤ 15 (beyond that, 4-bit blocks collide
  * too often to help), and no equi-conjunct already links the sides
  * (an existing equi-join is already O(collisions); this also makes
  * the rewrite a fixed point — its own output carries block equalities).
  * Default ON; disable with `spark.graft.hammingBlockJoinRewrite=false`.
  */
class HammingBlockJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

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

  /** Orient (a, b) as (left-side, right-side) expressions, if they split. */
  private def oriented(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.nonEmpty && b.references.nonEmpty
        && a.references.subsetOf(l.outputSet)
        && b.references.subsetOf(r.outputSet)) Some((a, b))
    else if (a.references.nonEmpty && b.references.nonEmpty
        && b.references.subsetOf(l.outputSet)
        && a.references.subsetOf(r.outputSet)) Some((b, a))
    else None

  private def hasEquiBetween(cs: Seq[Expression],
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
        val cs = conjuncts(cond)
        hammingBound(cs) match {
          case Some((ax, bx, k))
              if k >= 0 && k <= 15 && ax.dataType == LongType
                && bx.dataType == LongType && !hasEquiBetween(cs, l, r) =>
            oriented(ax, bx, l, r) match {
              case Some((a, b)) =>
                val n = k + 1
                val base = 64 / n
                val rem = 64 % n
                val widths = (0 until n).map(i =>
                  base + (if (i < rem) 1 else 0))
                val offsets = widths.scanLeft(0)(_ + _)
                val branches = (0 until n).map { i =>
                  val eqI = EqualTo(blockOf(a, offsets(i), widths(i)),
                    blockOf(b, offsets(i), widths(i)))
                  val neBefore = (0 until i).map(p =>
                    Not(EqualTo(blockOf(a, offsets(p), widths(p)),
                      blockOf(b, offsets(p), widths(p)))))
                  val full = (Seq(eqI) ++ neBefore :+ cond).reduce(And)
                  Join(l, r, Inner, Some(full), hint)
                }
                if (branches.size == 1) branches.head
                else Union(branches.toIndexedSeq)
              case None => j
            }
          case _ => j
        }
    }
  }
}
