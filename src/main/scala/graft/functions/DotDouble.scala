package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** In-order dot product of two `ARRAY<DOUBLE>` columns — the cosine/ANN hot
  * path (SimilarityOps s01-s03, DedupOps d05).
  *
  * For equal-length inputs this matches
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * bit-for-bit (left-to-right summation, so oracle FP parity is
  * preserved). For ragged (unequal-length) inputs the two deliberately
  * diverge: the lambda form null-pads via zip_with and the fold returns
  * NULL, while dot_f64 sums over the first min(|a|,|b|) elements — the
  * useful semantics for truncated/prefix embeddings, pinned by
  * FunctionsSpec. Where the lambda form evaluates two higher-order
  * functions with per-element closure dispatch and an intermediate array
  * allocation, this native `Expression` codegens to a single primitive
  * loop over the two `ArrayData` buffers — the difference between ~10 ns
  * and ~100 ns per 64-dim pair, which at a 10^9-pair ANN probe stage is
  * the stage cost. Elements must be non-null (produced by a
  * `transform(_, CAST AS DOUBLE)` projection).
  */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_f64 requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $l.getDouble($i) * $r.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

object DotDouble {
  /** Column API for [[DotDouble]]. */
  def dotF64(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotDouble(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
