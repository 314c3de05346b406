package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ThetaSketchAgg: distributed distinct estimates within the 1/√k bound,
  * deterministic under repartitioning (hash-characterized, order-free), and
  * set algebra (∩, ∪, \) on pre-aggregated sketches matches exact set ops
  * within bound — the "sketch once, slice later" contract. */
class ThetaSketchAggSpec extends SparkSuite {

  private val agg = new ThetaSketchAgg(12)
  private def sketchOf(ds: org.apache.spark.sql.DataFrame): Array[Byte] =
    ds.select(udaf(agg).apply(col("v"))).head().getAs[Array[Byte]](0)

  test("estimate within 3/sqrt(k) of exact distinct; identical across " +
      "different partitionings (order-free)") {
    val a = spark.range(0, 50000).select((col("id") * 7919L).as("v"))
    val est4 = ThetaSketchAgg.estimate(sketchOf(a.repartition(4)))
    val est13 = ThetaSketchAgg.estimate(sketchOf(a.repartition(13)))
    assert(est4 == est13, s"partitioning changed the estimate: $est4 vs $est13")
    val rse = 3.0 / math.sqrt(1 << 12)
    assert(math.abs(est4 - 50000) <= 50000 * rse,
      s"estimate $est4 outside ±${50000 * rse} of 50000")
  }

  test("set algebra on sketches: |A∩B|, |A∪B|, |A\\B| within bound of " +
      "exact, sketches built independently per segment") {
    // A = multiples of 2 in [0, 60000); B = multiples of 3 → A∩B = mult of 6
    val a = spark.range(0, 60000).select((col("id") * 2).as("v"))
    val b = spark.range(0, 40000).select((col("id") * 3).as("v"))
    val (sa, sb) = (sketchOf(a), sketchOf(b))
    val rse = 3.0 / math.sqrt(1 << 12)
    def check(est: Double, exact: Double, label: String): Unit =
      assert(math.abs(est - exact) <= exact * 2 * rse + 1,
        s"$label: est $est vs exact $exact")
    check(ThetaSketchAgg.estimate(ThetaSketchAgg.intersect(sa, sb)),
      20000.0, "A∩B")  // multiples of 6 below 120000: 20000
    check(ThetaSketchAgg.estimate(ThetaSketchAgg.union(sa, sb)),
      80000.0, "A∪B") // 60000 + 40000 - 20000 overlap
    check(ThetaSketchAgg.estimate(ThetaSketchAgg.aNotB(sa, sb)),
      40000.0, "A\\B")
  }
}
