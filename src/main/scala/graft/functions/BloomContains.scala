package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter over 64-bit keys.
  *
  * Scale rationale: a broadcast-hash semi-join (t08/p05's decontamination
  * shape) holds the full probe key set in every executor's hash relation.
  * When the probe side outgrows the broadcast budget (a benchmark-suite
  * union can reach 10^8+ distinct grams), a Bloom filter at ~10 bits/key is
  * 1-2 orders of magnitude smaller and keeps the corpus-side prefilter
  * entirely map-side — no shuffle, no join. False positives are possible
  * (callers MUST re-confirm survivors exactly — see CorpusPipeline p08);
  * false negatives are not, so no contaminated document escapes the
  * prefilter.
  *
  * Native `Expression` with `doGenCode` (SURVEY §2.8 preference order):
  * whole-stage codegen emits one virtual call on a shared deserialized
  * filter per probe — no UDF boxing. The serialized filter bits travel as
  * a BROADCAST VARIABLE: the expression carries only the handle, so task
  * binaries stay small and each executor fetches the bits once (the
  * previous shape task-serialized the bytes via `addReferenceObj`, one
  * copy per plan reference per task closure).
  *
  * Reference anchor: ziggurat has no analytics surface (SURVEY §2.6 —
  * absent by design); this is north-star extension surface for the
  * decontamination pipeline.
  */
case class BloomContainsLong(child: Expression,
    bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires BIGINT, got ${child.dataType.simpleString}")

  // deserialized once per task from the executor-shared broadcast bytes
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))

  /** Called from both interpreted eval and generated code. */
  def contains(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    contains(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomContainsLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.contains($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomContains {

  /** Builds a serialized Bloom filter from the long keys of `keys`' single
    * column — DISTRIBUTED: Spark's `stat.bloomFilter` aggregates
    * per-partition filters and merges on the driver, so only the final
    * ~10-bits/key bit array (≈1.2 MB per million keys) ever reaches the
    * driver. A collect-then-insert build would materialize every key as a
    * driver-side Row first — OOM at exactly the 10^8-key probe scale this
    * expression exists for. The sizing count is one cheap aggregate
    * (duplicate keys inflate it harmlessly: the filter just gets a lower
    * effective fpp). When the key set ALSO fits the exact-confirm cap,
    * prefer [[ExactSetContains.buildBoth]] — it feeds the bloom from the
    * same collected keys, saving this second scan. */
  def build(keys: org.apache.spark.sql.DataFrame, fpp: Double = 0.01): Array[Byte] = {
    val keyCol = keys.columns.head
    val n = keys.select(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.col(keyCol))).head().getLong(0)
    val bf: BloomFilter =
      keys.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column API for [[BloomContainsLong]] over an existing broadcast. */
  def bloomContains(c: Column, bloomBc: Broadcast[Array[Byte]]): Column =
    ColumnBridge.column(
      BloomContainsLong(ColumnBridge.expression(c), bloomBc))

  /** Column API for [[BloomContainsLong]]; broadcasts `bloomBytes`
    * (call once per query build — each call creates one broadcast). */
  def bloomContains(c: Column, bloomBytes: Array[Byte]): Column =
    bloomContains(c, SparkSession.active.sparkContext.broadcast(bloomBytes))
}
