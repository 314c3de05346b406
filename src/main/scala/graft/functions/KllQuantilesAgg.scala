package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KLL quantile sketch (Karnin-Lang-Liberty 2016) — the
  * distribution-shaped leg of the sketch surface: theta ([[ThetaSketchAgg]])
  * answers "how many distinct", frequent-items ([[FreqItemsAgg]]) "which
  * values dominate", KLL "where do the quantiles sit". Unlike a10's
  * `approx_percentile` (whose Greenwald-Khanna state is consumed inside one
  * query), a KLL sketch is a first-class VALUE: sketch once per fine cell
  * (day × type × shard), persist the bytes, and answer any coarser rollup's
  * p50/p90/p99 later by merging cell sketches — the same cube shape a19
  * uses for sliding distinct counts. At 100 TB that difference is the whole
  * game: exact quantiles need a per-group sort of the raw data per grain;
  * KLL pays one scan ever, then O(cells) per question.
  *
  * k = 200 (library default) gives ~1.65% one-sided rank error at 99%
  * confidence in ≤ ~5 KB per sketch, independent of stream length. Rank
  * error bounds hold under ARBITRARY merge order (the KLL compactor
  * guarantee), so estimates are stable under repartitioning to within the
  * published bound — the within-bound gate a27 pins, same contract style
  * as a06/a10/a15.
  *
  * Buffer is the LIVE heap sketch: Spark's typed-aggregate path keeps
  * buffers as objects between rows and only hits the encoder at
  * shuffle/spill boundaries, so per-row cost is the sketch's own amortized
  * O(1) update (see ThetaSketchAgg for why the bytes-buffer formulation
  * loses).
  */
final class KllQuantilesAgg(k: Int = 200)
    extends Aggregator[Double, KllDoublesSketch, Array[Byte]] {

  override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def reduce(buf: KllDoublesSketch, v: Double): KllDoublesSketch = {
    buf.update(v)
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def finish(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def bufferEncoder: Encoder[KllDoublesSketch] =
    Encoders.kryo[KllDoublesSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Second-stage rollup: merges ALREADY-BUILT KLL sketch bytes — the
  * pre-aggregated-cube companion (ThetaUnionAgg's quantile twin). Fine
  * cells sketch once; any coarser grain is a merge of cell bytes. */
final class KllMergeAgg(k: Int = 200)
    extends Aggregator[Array[Byte], KllDoublesSketch, Array[Byte]] {

  override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def reduce(buf: KllDoublesSketch, bytes: Array[Byte]): KllDoublesSketch = {
    if (bytes != null && bytes.nonEmpty)
      buf.merge(KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(bytes)))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def finish(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def bufferEncoder: Encoder[KllDoublesSketch] =
    Encoders.kryo[KllDoublesSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KllQuantilesAgg {
  /** Quantile estimate from compact sketch bytes (rank in [0,1]). */
  def quantile(bytes: Array[Byte], rank: Double): Double =
    KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes)).getQuantile(rank)

  /** Retained-item count (diagnostic: proves sublinear state). */
  def numRetained(bytes: Array[Byte]): Int =
    KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes)).getNumRetained
}
