package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash of an `ARRAY<STRING>` token array in one per-row pass —
  * the native form of DedupOps d04's explode → distinct → 32-vote
  * aggregate. Semantics are identical by construction: votes are taken
  * over the DISTINCT token set (doc-local), each token's md5-prefix h32
  * contributes ±1 per bit, bit set iff its vote sum is positive; integer
  * vote sums are order-independent, so the value matches the aggregate
  * formulation exactly.
  *
  * The win is topological: the dataframe form shuffles the exploded token
  * rows twice (global distinct, then the per-doc vote aggregate) to
  * rebuild per-document state this expression computes where the document
  * already lives — fingerprinting becomes a zero-shuffle map stage at any
  * corpus size.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 requires ARRAY<STRING>, got ${other.simpleString}")
    }

  override def prettyName: String = "simhash32"

  /** NULL for an empty / all-null token array, not 0L: the aggregate
    * spelling this replaces emits NO row for such docs (nothing to
    * explode), and a shared 0 sentinel would hamming-join every empty
    * doc with every other at distance 0 — the same null-for-empty
    * contract as [[MinHashSig.compute]]. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.functions.SimHash32$$.MODULE$$.compute($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Boxed on purpose (null = empty/all-null token array — see the
    * expression's nullable note). */
  def compute(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val digest = md5.get()
    var j = 0
    while (j < n) {
      // null TOKENS are skipped (engine inputs are split() output and
      // carry none, but the function is SQL-registered — the aggregate
      // spelling this replaces drops nulls at its distinct, and a
      // silent NPE would kill the task instead)
      val t = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
      // distinct over token VALUES (toString copies out of any shared
      // UnsafeArrayData buffer before the set holds a reference)
      if (t != null && seen.add(t.toString)) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        // first 8 md5 hex digits = first 4 digest bytes, big-endian (h32)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    if (seen.isEmpty) null
    else {
      var sig = 0L
      var b = 0
      while (b < 32) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
      java.lang.Long.valueOf(sig)
    }
  }

  /** Column API: 32-bit SimHash fingerprint of an ARRAY<STRING>. */
  def simhash32(toks: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(toks)))
}
