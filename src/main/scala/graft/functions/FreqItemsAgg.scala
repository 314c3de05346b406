package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items (heavy-hitters) sketch — the third leg of the
  * sketch surface next to HLL (a06) and KLL-style quantiles (a10), built on
  * the DataSketches `ItemsSketch` (Misra-Gries family) that ships with
  * Spark's jars.
  *
  * Why a sketch when t05 computes exact top-k: the exact aggregate's
  * shuffle carries one row per distinct key per partition — fine for
  * bigrams, ruinous for, say, (user, url) pairs with billions of distinct
  * keys. The sketch bounds memory at `maxMapSize` entries per partition
  * and merges associatively, so the shuffle carries one ~KB buffer per
  * partition regardless of cardinality.
  *
  * Guarantee (spec-gated, not oracle-gated): with NO_FALSE_NEGATIVES,
  * every item whose true count exceeds `getMaximumError` appears in the
  * result — eviction order makes the *estimates* run-dependent (which is
  * why this is library surface with a ScalaTest contract, not a declared
  * oracle query; the oracle-facing exact twin is t05), but the containment
  * guarantee holds on every run. At corpus scale the pattern is: sketch
  * pass → candidate set → exact confirm of candidates only (same
  * bloom-then-confirm discipline as p08).
  *
  * Buffers travel as the sketch's own compact byte serialization —
  * constant-size, spill-friendly, portable across executors.
  */
final class FreqItemsAgg(maxMapSize: Int)
    extends Aggregator[String, Array[Byte], Map[String, Long]] {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  private def load(buf: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(buf), serde)

  override def zero: Array[Byte] =
    new ItemsSketch[String](maxMapSize).toByteArray(serde)

  override def reduce(buf: Array[Byte], item: String): Array[Byte] = {
    val sk = load(buf)
    sk.update(item)
    sk.toByteArray(serde)
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = load(a)
    sa.merge(load(b))
    sa.toByteArray(serde)
  }

  /** item → estimated count, NO_FALSE_NEGATIVES: a superset of every item
    * with true count > maximum error. */
  override def finish(buf: Array[Byte]): Map[String, Long] =
    load(buf).getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => r.getItem -> r.getEstimate).toMap

  /** The sketch's error bound for the same buffer (for candidate-set
    * threshold checks). */
  def maximumError(buf: Array[Byte]): Long = load(buf).getMaximumError

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
