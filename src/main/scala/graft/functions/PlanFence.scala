package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity passthrough that declares itself NON-deterministic — an
  * optimizer fence. `PushDownPredicates` (and every other rule that
  * relocates expressions) only moves deterministic predicates, so a
  * filter whose condition is wrapped in a fence stays exactly where the
  * query author put it.
  *
  * Why this exists: predicate pushdown assumes filters are cheap and
  * earlier-is-better. A decontamination predicate that re-derives a
  * document's full gram-hash array per row is the opposite — pushed
  * below a spreading repartition it lands on the PRE-shuffle stage,
  * which for a locally-unsplittable input (single parquet row group) is
  * ONE task: the whole corpus decision serializes onto one thread
  * (measured 5.4 s vs ~0.5 s for p21 at sf0.1). On a real cluster the
  * input arrives as many splits and scan-side filtering is the right
  * shape — there you simply don't fence (or repartition).
  *
  * Runtime cost: zero. Interpreted eval delegates to the child;
  * codegen emits the child's code verbatim. The only effect is the
  * `deterministic = false` flag the optimizer reads.
  *
  * BLAST RADIUS — keep uses narrow: the flag disables more than the
  * targeted pushdown. A fenced VALUE in a Project marks the whole
  * Project non-deterministic, which also blocks project collapsing,
  * pushdown of genuinely cheap user filters through it, and
  * exchange/subtree canonicalization-based reuse for every downstream
  * consumer of that frame. Every current use (d04's parity filter,
  * simhash64's fingerprint, longTrigrams' gram array) wraps only a
  * value computed ONCE above a spreading repartition — where the
  * substitution it prevents was pure waste at any scale — and was
  * audited against the executed plans of all its consumers. A new use
  * needs the same case-by-case plan audit, at the NARROWEST projection
  * possible.
  */
case class PlanFence(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "plan_fence"

  // the entire point of the expression — see class doc
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PlanFence =
    copy(child = newChild)
}

object PlanFence {
  /** Column API: `df.filter(fence(expensivePredicate))` pins the filter
    * at its authored position in the plan. */
  def fence(c: Column): Column =
    ColumnBridge.column(PlanFence(ColumnBridge.expression(c)))
}
