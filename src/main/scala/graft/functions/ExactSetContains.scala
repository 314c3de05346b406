package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** EXACT membership probe against a sorted immutable 64-bit key set —
  * the confirm stage [[BloomContainsLong]]'s contract demands, packaged
  * as the same kind of native codegen expression so the whole
  * decontamination decision (bloom prefilter AND exact confirm) can run
  * map-side inside one `exists()` over a document's gram hashes: no
  * explode, no shuffle, no join, per-probe cost one binary search
  * (~log2 n long compares over a primitive array — no boxing, cache-
  * friendly).
  *
  * Scale rationale: a broadcast-hash semi-join re-confirms survivors
  * exactly but needs the explode + join topology (p05/p08); this
  * expression removes the join entirely WHEN the probe key set fits
  * executor memory as a primitive array (8 bytes/key — 10^7 keys =
  * 80 MB, the same budget a broadcast-hash relation of those keys would
  * multiply several-fold with hashmap overhead). Beyond that, fall back
  * to p08's explode + broadcast-confirm shape. [[ExactSetContains.build]]
  * enforces the cap loudly.
  *
  * The sorted array travels as a BROADCAST VARIABLE: the expression
  * carries only the (tiny) broadcast handle, so task binaries stay
  * small no matter how many plan nodes reference the probe — each
  * executor fetches the array blocks once and every task on it shares
  * the one copy. (The previous shape task-serialized the raw array via
  * `addReferenceObj` — up to 160 MB per stage's task closure at the
  * cap.)
  *
  * Reference anchor: ziggurat has no analytics surface (SURVEY §2.6 —
  * absent by design); north-star extension surface for the
  * decontamination pipeline.
  */
case class SortedLongSetContains(child: Expression,
    keysBc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_set_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_set_contains requires BIGINT, got ${child.dataType.simpleString}")

  // resolved once per deserialized expression instance (per task); the
  // underlying fetch happens once per executor
  @transient private lazy val sortedKeys: Array[Long] = keysBc.value

  /** Called from both interpreted eval and generated code. */
  def contains(v: Long): Boolean =
    java.util.Arrays.binarySearch(sortedKeys, v) >= 0

  override protected def nullSafeEval(v: Any): Any =
    contains(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSetContains", this,
      classOf[SortedLongSetContains].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.contains($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedLongSetContains =
    copy(child = newChild)
}

object ExactSetContains {

  /** Collects the DISTINCT long keys of `keys`' single column into a
    * sorted primitive array. Distinct + sort run DISTRIBUTED; only the
    * final deduplicated keys reach the driver (8 bytes each). `maxKeys`
    * is a loud guard, not a truncation: silently dropping probe keys
    * would let contaminated documents through, so an oversized set
    * throws with the p08 fallback named — and it fires from a cheap
    * count aggregate BEFORE the collect, so the driver never holds an
    * over-cap array. */
  def build(keys: org.apache.spark.sql.DataFrame,
      maxKeys: Long = 20L * 1000 * 1000): Array[Long] = {
    import org.apache.spark.sql.functions.{col, count_distinct}
    val keyCol = keys.columns.head
    // the guard must count the SAME set the collect below builds —
    // distinct AFTER cast-to-long and null filtering. Counting the raw
    // column spuriously rejected probe sets whose raw values collapse
    // under the cast (string keys with duplicates-modulo-parse or
    // non-numeric entries → null) even though the real array fits.
    val asLong = keys.select(col(keyCol).cast("long").as(keyCol))
      .where(col(keyCol).isNotNull)
    val n = asLong.select(count_distinct(col(keyCol))).head().getLong(0)
    require(n <= maxKeys,
      s"exact probe set has $n distinct keys (> $maxKeys): too large for " +
        "a driver-collected confirm array — use the explode + broadcast " +
        "semi-join confirm (CorpusPipeline p08's shape) instead")
    // collect through the primitive Long encoder — Array[Long] lands
    // unboxed on the driver (8 bytes/key, as documented); a Row
    // collect would transiently hold ~20M boxed rows at the cap
    val sess = keys.sparkSession
    import sess.implicits._
    asLong.distinct().sort(col(keyCol)).as[Long].collect()
  }

  /** Builds BOTH decontamination support structures — the exact sorted
    * confirm array AND the bloom prefilter — from ONE heavy distributed
    * pass over the probe relation: the distinct keys are collected once
    * (plus [[build]]'s cheap count-aggregate cap guard), and the bloom
    * is fed driver-side from the already-collected array (n `putLong`s
    * into a local bitset — no second scan of the probe). Both return as
    * broadcast handles ready for [[sortedSetContains]] /
    * [[BloomContains.bloomContains]]. */
  def buildBoth(keys: org.apache.spark.sql.DataFrame, fpp: Double = 0.01,
      maxKeys: Long = 20L * 1000 * 1000)
      : (Broadcast[Array[Long]], Broadcast[Array[Byte]]) = {
    val arr = build(keys, maxKeys)
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(arr.length, 1).toLong, fpp)
    arr.foreach(bf.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val sc = keys.sparkSession.sparkContext
    (sc.broadcast(arr), sc.broadcast(out.toByteArray))
  }

  /** Column API for [[SortedLongSetContains]] over an existing broadcast. */
  def sortedSetContains(c: Column, keysBc: Broadcast[Array[Long]]): Column =
    ColumnBridge.column(
      SortedLongSetContains(ColumnBridge.expression(c), keysBc))

  /** Column API for [[SortedLongSetContains]]; broadcasts `sortedKeys`
    * (call once per query build — each call creates one broadcast). */
  def sortedSetContains(c: Column, sortedKeys: Array[Long]): Column =
    sortedSetContains(c,
      SparkSession.active.sparkContext.broadcast(sortedKeys))
}
