package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketch, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable theta sketch — distinct counting WITH set algebra, the
  * capability HLL (a06) lacks: two theta sketches intersect and difference,
  * so "distinct users in segment A ∩ B" costs two sketch columns instead of
  * a re-scan with a combined predicate. The fourth leg of the sketch
  * surface (HLL a06, quantiles a10, frequent items FreqItemsAgg).
  *
  * Unlike the frequent-items sketch, theta sketches are HASH-characterized:
  * the retained set is "all hashes < θ", which depends only on the value
  * multiset, not on arrival order — so estimates are deterministic under
  * repartitioning (same property that lets a06 be oracle-gated; the spec
  * asserts it). Set-op results carry the standard 1/√k relative error.
  *
  * Aggregation state travels as compact sketch bytes (≤ ~8·k bytes),
  * constant-size and associatively mergeable — the 100 TB rollup shape:
  * sketch once per (dimension cell), answer arbitrary unions/intersections
  * of cells later without touching the data again.
  */
final class ThetaSketchAgg(lgK: Int = 12)
    extends Aggregator[Long, Union, Array[Byte]] {

  // The buffer is the LIVE Union object: Spark's typed-aggregate path
  // (TypedImperativeAggregate) keeps buffers as objects between rows and
  // only runs the encoder at shuffle/spill boundaries, so update cost is
  // the sketch's own O(1) amortized insert — a deserialize/reserialize
  // round-trip per row (the naive compact-bytes-buffer formulation) would
  // make serde dominate the scan at scale.
  override def zero: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def reduce(buf: Union, v: Long): Union = {
    buf.update(v)
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def finish(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def bufferEncoder: Encoder[Union] = Encoders.kryo[Union]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Second-stage rollup: unions ALREADY-BUILT compact sketches. The
  * pre-aggregated cube shape at 100 TB — sketch once per fine cell (day,
  * segment, shard), then answer any coarser window/rollup by merging the
  * cells' sketch bytes without touching raw data again (a19 merges each
  * day's sketch into the 7 sliding windows it serves). Buffer is the live
  * Union object, same rationale as [[ThetaSketchAgg]]. */
final class ThetaUnionAgg(lgK: Int = 12)
    extends Aggregator[Array[Byte], Union, Array[Byte]] {

  override def zero: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def reduce(buf: Union, bytes: Array[Byte]): Union = {
    if (bytes != null && bytes.nonEmpty)
      buf.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def finish(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def bufferEncoder: Encoder[Union] = Encoders.kryo[Union]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object ThetaSketchAgg {

  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  /** The sketch's OWN error bounds (exact-mode sketches return the
    * estimate itself). For set-operation RESULTS these are the only
    * statistically valid bounds — an intersection's error scales with
    * the UNION cardinality, not the intersection size, so a hand-rolled
    * `±k·rse·|A∩B|` gate flips false once sketches leave exact mode. */
  def lowerBound(bytes: Array[Byte], numStdDev: Int): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getLowerBound(numStdDev)
  def upperBound(bytes: Array[Byte], numStdDev: Int): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getUpperBound(numStdDev)

  def union(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Array[Byte] = {
    val u: Union = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    i.getResult.toByteArray
  }

  /** a \ b (distinct in a, not in b). */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = SetOperation.builder().buildANotB()
    d.aNotB(
      Sketches.wrapCompactSketch(Memory.wrap(a)),
      Sketches.wrapCompactSketch(Memory.wrap(b))).toByteArray
  }
}
