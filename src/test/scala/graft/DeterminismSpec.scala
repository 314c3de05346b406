package graft

/** Partitioning-invariance sweep: a query's RESULT must not depend on how
  * the cluster happened to shuffle it. The DuckDB oracle proves values once
  * at one configuration; this sweep re-executes representative queries at
  * shuffle.partitions = 2 and 17 (coprime, forcing different row routing)
  * and asserts bit-identical row multisets — catching float summation-order
  * drift, rank ties broken by arrival order, first()/head-style
  * nondeterminism, and sampling keyed off partition ids. Invariance here is
  * exactly "the answer survives a cluster resize", the property a 100 TB
  * deployment leans on every time AQE re-plans.
  *
  * One delegate per operator family that computes (aggregation, windows,
  * LSH dedup, ANN, sampling, packing order, diff, listagg, sketch gates).
  */
class DeterminismSpec extends SparkSuite {

  private val names = Seq(
    "q02_agg_pricing",       // float sums + avg
    "q47_listagg",           // ordered string concat
    "a26_resample_locf",     // window fill + max_by tie-break
    "d03_dedup_minhash_lsh", // banded candidate generation
    "d22_jaccard_threshold_sweep", // countDistinct over pair frame
    "s15_ann_multiprobe",    // bucket join + rank ties
    "t12_tfidf_keywords",    // rank over integer score
    "x01_hash_sample",       // content-hash gate
    "p09_epoch_shuffle_order", // permutation positions
    "p15_corpus_diff",       // full-outer join statuses
    "p16_length_buckets",    // integer bucket math
    "x14_rolling_origin_split",
    "s17_mmr_rerank",        // unrolled greedy argmax in basis points
    "x15_neyman_allocation", // isqrt weights + largest-remainder seats
    "a32_cohort_ltv",        // zero-filled grid + running sums
    "t27_pmi_collocations",  // floor-log2 rational + top-k ties
    "p20_shard_balance",     // serpentine rank assignment
    "d27_overlap_join_rewrite", // overlap rewrite's exploded equi-join
    "d28_membership_join",   // membership rewrite + offset/limit panel
    "d33_jaccard_theta_rewrite", // dynamic-prefix two-phase + stable rowids
    "d34_anti_threshold_scrub")  // pair-verify anti over stable rowids

  private def multiset(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  names.foreach { name =>
    test(s"$name: identical row multiset at shuffle.partitions 2 vs 17") {
      val a = multiset(name, 2)
      val b = multiset(name, 17)
      assert(a.nonEmpty, s"$name empty at sf0.001")
      assert(a == b,
        s"$name diverged across partitioning: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    }
  }
}
