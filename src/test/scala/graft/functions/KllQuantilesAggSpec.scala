package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** KllQuantilesAgg: distributed quantile estimates within the published
  * rank-error bound, stable under repartitioning to within that bound,
  * two-stage cell-merge rollup ≡ one-shot sketch contract, and sublinear
  * retained state — the "sketch per cell, roll up later" shape a27 runs. */
class KllQuantilesAggSpec extends SparkSuite {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.select(udaf(new KllQuantilesAgg(200)).apply(col("v")))
      .head().getAs[Array[Byte]](0)

  test("p50/p90 within normalized rank error of exact on a known " +
      "distribution, any partitioning") {
    // v = id over [0, 100000): exact quantile at rank p is p * 100000
    val n = 100000
    val a = spark.range(0, n).select(col("id").cast("double").as("v"))
    val eps = 0.02 // k=200 → ~1.65% @99%; 2% absorbs the tail
    for (parts <- Seq(3, 17)) {
      val b = sketchOf(a.repartition(parts))
      for (p <- Seq(0.5, 0.9)) {
        val est = KllQuantilesAgg.quantile(b, p)
        assert(math.abs(est - p * n) <= eps * n,
          s"parts=$parts p=$p: est $est vs exact ${p * n} (±${eps * n})")
      }
    }
  }

  test("two-stage rollup (per-cell sketch then byte merge) answers within " +
      "bound of the one-shot sketch over the union") {
    val n = 60000
    val all = spark.range(0, n).select(
      (col("id") % 6).as("cell"), col("id").cast("double").as("v"))
    val cells = all.groupBy(col("cell"))
      .agg(udaf(new KllQuantilesAgg(200)).apply(col("v")).as("sk"))
    val merged = cells
      .agg(udaf(new KllMergeAgg(200)).apply(col("sk")))
      .head().getAs[Array[Byte]](0)
    val eps = 0.02
    for (p <- Seq(0.25, 0.5, 0.75, 0.95)) {
      val est = KllQuantilesAgg.quantile(merged, p)
      assert(math.abs(est - p * n) <= eps * n,
        s"p=$p: merged est $est vs exact ${p * n}")
    }
  }

  test("retained state is sublinear: 1M values keep < 2000 items") {
    val b = sketchOf(
      spark.range(0, 1000000).select(col("id").cast("double").as("v")))
    val kept = KllQuantilesAgg.numRetained(b)
    assert(kept < 2000, s"retained $kept items for 1M inputs")
    assert(b.length < 20000, s"sketch bytes ${b.length}")
  }
}
