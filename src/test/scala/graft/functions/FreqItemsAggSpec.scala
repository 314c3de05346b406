package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** FreqItemsAgg contract: distributed execution honors the Misra-Gries
  * NO_FALSE_NEGATIVES guarantee — every truly-frequent item survives — and
  * merge across partitions loses nothing an exact count would keep. */
class FreqItemsAggSpec extends SparkSuite {

  test("no false negatives: every item above the error bound is returned " +
      "(distributed, skewed input, small sketch forcing evictions)") {
    val sess = spark
    import sess.implicits._
    // skewed counts: item k appears k² times, k = 1..60 → heavy tail of
    // rare items plus a few dominant ones; 8-entry sketch must evict
    val rows = (1 to 60).flatMap(k => Seq.fill(k * k)(s"item$k"))
    val ds = spark.createDataset(rows).repartition(8)
    val agg = new FreqItemsAgg(8)
    val sketch = ds.select(udaf(agg).apply(col("value"))).head().getMap[String, Long](0)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    // DataSketches ItemsSketch documents epsilon ≈ 3.5 / maxMapSize, i.e.
    // maximum error ≈ 3.5·N/M (merging partition sketches sums their
    // per-partition bounds, still ≤ 3.5·N/M total); anything truly above
    // it must be present
    val loosePublicBound = 3.5 * n / 8
    val missingHeavy = exact.filter { case (_, c) => c > loosePublicBound }
      .keySet.diff(sketch.keySet)
    assert(missingHeavy.isEmpty,
      s"items above the error bound missing from sketch: $missingHeavy")
    // estimates never undershoot by more than the bound, never overshoot
    // the bound above truth
    sketch.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est >= truth - loosePublicBound && est <= truth + loosePublicBound,
        s"$item: est $est vs truth $truth exceeds error bound $loosePublicBound")
    }
  }

  test("sketch-then-exact-confirm equals exact heavy hitters (the scale " +
      "pattern: candidates from the sketch, counts from a filtered scan)") {
    val sess = spark
    import sess.implicits._
    val rows = (1 to 40).flatMap(k => Seq.fill(k * k * 3)(s"w$k"))
    val ds = spark.createDataset(rows).repartition(4)
    val n = rows.size.toLong
    val threshold = n / 10
    val agg = new FreqItemsAgg(16)
    val candidates = ds.select(udaf(agg).apply(col("value")))
      .head().getMap[String, Long](0).keySet
    // exact confirm only the candidate set
    val confirmed = ds.filter(col("value").isin(candidates.toSeq: _*))
      .groupBy(col("value")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    assert(confirmed == exact,
      s"sketch+confirm diverged from exact: $confirmed vs $exact")
  }
}
