package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** 8-bit random-hyperplane LSH bucket of an `ARRAY<DOUBLE>` vector in one
  * per-row pass — the native form of the bucketing the ANN/near-dup scale
  * paths key on (SimilarityOps s02, DedupOps d09).
  *
  * Plane weights are the same md5-derived constants the DuckDB twin
  * rebuilds (`(h32("p:d") mod 1001 − 500) / 500`, [[StableHash]]), dots
  * accumulate in dimension order, and bit p is set iff dot_p > 0 — so the
  * value is bit-identical to the dataframe formulation it replaces
  * (posexplode → broadcast-join the 8×64 plane table → two keyed
  * aggregates). The win is topological, not just constant-factor: the
  * dataframe form SHUFFLES (vec_id, plane) partial-sum rows through two
  * aggregates to rebuild per-row state, while this expression computes the
  * bucket where the vector already lives — signature assignment becomes a
  * zero-shuffle map stage at any corpus size.
  */
case class HyperplaneBucket(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket requires ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucket$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  private val planes = 8
  private val dims = 64

  /** W(p)(d) = (h32("p:d") mod 1001 − 500) / 500 — the exact per-plane
    * weights of the dataframe/oracle formulation. */
  private val W: Array[Array[Double]] = Array.tabulate(planes, dims) {
    (p, d) =>
      (StableHash.h32Jvm(s"$p:$d") % 1001 - 500).toDouble / 500.0
  }

  /** Bucket of `v` (dims beyond [[dims]] ignored; shorter vectors use the
    * available prefix — matching the join semantics of the dataframe
    * form, which only pairs existing (d, plane) rows). */
  def compute(v: ArrayData): Long = {
    val n = math.min(v.numElements(), dims)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val w = W(p)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * w(d); d += 1 }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** Column API: 8-bit LSH bucket id of an ARRAY<DOUBLE> embedding. */
  def bucket8(v: Column): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(v)))
}
