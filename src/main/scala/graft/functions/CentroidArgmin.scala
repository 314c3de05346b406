package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment over a broadcast centroid ARRAY — the
  * Lloyd's-iteration hot path (SimilarityOps.kmeansAssignments: s05, d10,
  * x07).
  *
  * Semantics are EXACTLY the former DataFrame spelling
  *
  * {{{
  *   emb.join(broadcast(cents), lit(true))
  *     .withColumn("cc", round(dot_f64(vd, cv) / (nrm * cn), 4))
  *     .groupBy(vec_id)
  *     .agg(min_by(struct(...), struct(negate(cc), cid)))
  * }}}
  *
  * i.e. maximize the 4dp-HALF_UP-rounded cosine with smallest-cid
  * tiebreak, where
  *
  *  - the dot product is the same in-order fold as [[DotDouble]] over the
  *    first min(|vd|,|cv|) elements,
  *  - [[CentroidArgmin.round4]] mirrors Catalyst `RoundBase`'s DoubleType
  *    path bit-for-bit (NaN/Infinity pass through; otherwise
  *    `java.math.BigDecimal.valueOf(x).setScale(4, HALF_UP)`), and
  *  - the comparison is `SQLOrderingUtil.compareDoubles` on the NEGATED
  *    cosine (Catalyst's own double ordering: NaN sorts last, -0.0 ==
  *    0.0) with the long cid as tiebreak — exactly the
  *    `min_by(struct(-cc, cid))` total order.
  *
  * What the expression buys (guide §4 expressions / §2.4 remove shuffles):
  * the former spelling materialized N·k joined rows each carrying the
  * full 64-double vector, built a struct per candidate, and paid a
  * hash-aggregate exchange per assign pass just to reduce k=8 candidates
  * per vector. This is ONE codegen'd k×d primitive loop per vector row —
  * no N·k intermediate rows, no struct comparators, no exchange: each
  * Lloyd assign pass becomes a pure map over the (cached) vector frame.
  *
  * Inputs: vd ARRAY<DOUBLE> (non-null elements), nrm DOUBLE, cents
  * ARRAY<STRUCT<cid: BIGINT, cv: ARRAY<DOUBLE>, cn: DOUBLE>> (the k-row
  * centroid frame gathered with sort_array(collect_list(...)) — order
  * does not matter, the total order above is order-insensitive). Output:
  * STRUCT<cid: BIGINT, cc: DOUBLE>, or NULL for an empty centroid array
  * (an empty corpus has no centroids — callers see zero rows before this
  * can ever evaluate; the NULL keeps the expression total).
  */
case class CentroidArgmin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cc", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "centroid_argmin"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val centsOk = third.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _),
        StructField(_, DoubleType, _, _))), _) => true
      case _ => false
    }
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && second.dataType == DoubleType && centsOk
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "centroid_argmin requires (ARRAY<DOUBLE>, DOUBLE, " +
        "ARRAY<STRUCT<BIGINT, ARRAY<DOUBLE>, DOUBLE>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override protected def nullSafeEval(v: Any, n: Any, c: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    val nrm = n.asInstanceOf[Double]
    val cents = c.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    var bestCid = 0L
    var bestCc = 0.0
    var found = false
    var j = 0
    while (j < k) {
      val ct = cents.getStruct(j, 3)
      val cid = ct.getLong(0)
      val cv = ct.getArray(1)
      val cn = ct.getDouble(2)
      val d = math.min(vd.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < d) { acc += vd.getDouble(i) * cv.getDouble(i); i += 1 }
      val cc = CentroidArgmin.round4(acc / (nrm * cn))
      val better =
        if (!found) true
        else {
          val cmp = SQLOrderingUtil.compareDoubles(-cc, -bestCc)
          cmp < 0 || (cmp == 0 && cid < bestCid)
        }
      if (better) { bestCid = cid; bestCc = cc; found = true }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, c) => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val ct = ctx.freshName("ct")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val cn = ctx.freshName("cn")
      val acc = ctx.freshName("acc")
      val cc = ctx.freshName("cc")
      val cmp = ctx.freshName("cmp")
      val better = ctx.freshName("better")
      val bestCid = ctx.freshName("bestCid")
      val bestCc = ctx.freshName("bestCc")
      val found = ctx.freshName("found")
      s"""
         |int $k = $c.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestCid = 0L;
         |  double $bestCc = 0.0;
         |  boolean $found = false;
         |  for (int $j = 0; $j < $k; $j++) {
         |    InternalRow $ct = $c.getStruct($j, 3);
         |    long $cid = $ct.getLong(0);
         |    ArrayData $cv = $ct.getArray(1);
         |    double $cn = $ct.getDouble(2);
         |    int $d = java.lang.Math.min($v.numElements(), $cv.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $acc += $v.getDouble($i) * $cv.getDouble($i);
         |    }
         |    double $cc = graft.functions.CentroidArgmin.round4($acc / ($n * $cn));
         |    boolean $better;
         |    if (!$found) {
         |      $better = true;
         |    } else {
         |      int $cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles(-$cc, -$bestCc);
         |      $better = $cmp < 0 || ($cmp == 0 && $cid < $bestCid);
         |    }
         |    if ($better) { $bestCid = $cid; $bestCc = $cc; $found = true; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |    .GenericInternalRow(new Object[]{$bestCid, $bestCc});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CentroidArgmin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CentroidArgmin {

  /** Catalyst `RoundBase`'s DoubleType path, verbatim (the codegen it
    * emits for `round(x, 4)`): NaN/Infinity pass through, everything
    * else rounds via the canonical-decimal BigDecimal at HALF_UP. Kept
    * bit-identical so the expression's cosine matches the former
    * `round(dot/(nrm*cn), 4)` column exactly. */
  def round4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column API: centroid_argmin(vd, nrm, cents) → struct(cid, cc). */
  def centroidArgmin(vd: Column, nrm: Column, cents: Column): Column =
    ColumnBridge.column(CentroidArgmin(
      ColumnBridge.expression(vd), ColumnBridge.expression(nrm),
      ColumnBridge.expression(cents)))
}
