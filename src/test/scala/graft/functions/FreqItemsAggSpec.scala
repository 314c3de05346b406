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
    // two dominant items that MUST survive (far above 3.5·N/M) plus a
    // long tail of 200 rare items forcing constant eviction in an
    // 8-entry sketch. N = 50000 + 30000 + 200·100 = 100000 →
    // bound = 3.5·N/8 = 43750 < 50000, so "alpha" sits above the bound
    // and the guarantee is actually exercised (a dropped-merge bug that
    // lost alpha WOULD fail this test).
    val rows = Seq.fill(50000)("alpha") ++ Seq.fill(30000)("beta") ++
      (1 to 200).flatMap(k => Seq.fill(100)(s"tail$k"))
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
    val heavy = exact.filter { case (_, c) => c > loosePublicBound }.keySet
    assert(heavy.nonEmpty, "test setup broken: nothing above the bound")
    val missingHeavy = heavy.diff(sketch.keySet)
    assert(missingHeavy.isEmpty,
      s"items above the error bound missing from sketch: $missingHeavy")
    // estimates never deviate from truth by more than the bound
    sketch.foreach { case (item, est) =>
      val truth = exact.getOrElse(item, 0L)
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
    // N = 3·Σk² (k≤40) = 66,420; counts are 3k² so the top items (k=34..40
    // → 3,468..4,800) clear n/20 = 3,321 — the threshold selects a real,
    // non-empty heavy-hitter set (n/10 selected nothing: max count 4,800
    // < 6,642, making the old assertion Map() == Map())
    val threshold = n / 20
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
    assert(exact.nonEmpty, "test setup broken: no exact heavy hitters")
    assert(confirmed == exact,
      s"sketch+confirm diverged from exact: $confirmed vs $exact")
  }
}
