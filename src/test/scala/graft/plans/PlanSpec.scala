package graft.plans

import graft.{SparkSuite, SparkEntry}

/** Pins the physical plan shape of representative queries (see PlanChecks).
  * These run the query (AQE finalizes plans at execution), then assert on
  * the executed plan. */
class PlanSpec extends SparkSuite {

  private def run(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    // collect() executes THIS dataset's QueryExecution (count() would build
    // a separate one), finalizing the adaptive plan + codegen stages
    df.collect()
    df
  }

  test("q01: filters and projection are pushed into the parquet scan") {
    val df = run("q01_filter_project")
    assert(PlanChecks.hasPushedFilters(df))
    // 11-column lineitem pruned to the 5 referenced columns
    assert(PlanChecks.maxScanColumns(df) <= 5)
  }

  test("q03: dimension side broadcasts; no cartesian product") {
    val df = run("q03_join_revenue")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("q09: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(PlanChecks.usesTakeOrdered(run("q09_topk")))
  }

  test("d03: LSH candidate generation is an equi-join, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d03_dedup_minhash_lsh")))
  }

  test("d02: shingle self-join is an equi-join, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d02_dedup_ngram_jaccard")))
  }

  test("t04: fingerprinting is shuffle-free up to the output sort") {
    // one shuffle allowed: the documentsSpread repartition; the orderBy
    // adds a range exchange — everything in between is map-side
    assert(PlanChecks.countShuffles(run("t04_fingerprint")) <= 2)
  }

  test("q02: aggregation stays inside whole-stage codegen") {
    assert(PlanChecks.hasWholeStageCodegen(run("q02_agg_pricing")))
  }

  test("q31/q48: as-of joins (both directions) are single union-scans — " +
      "no join operator at all") {
    Seq("q31_asof_join", "q48_asof_forward").foreach { n =>
      val ops = PlanChecks.physical(run(n)).map(_.getClass.getSimpleName)
      assert(!ops.exists(_.contains("Join")),
        s"$n must not plan a join (pair blowup at scale); got $ops")
    }
  }

  test("q48: the forward as-of frame is the incremental GROWING kind — " +
      "a shrinking (unbounded-following) frame is quadratic per partition") {
    val plan = run("q48_asof_forward").queryExecution.executedPlan
      .toString.toLowerCase
    assert(!plan.contains("unboundedfollowing"),
      "quadratic unbounded-following frame crept back into q48")
    assert(plan.contains("unboundedpreceding"))
  }

  test("q32: band range-join broadcasts the band dim (nested-loop is the " +
      "right physical op for a 5-row non-equi dim)") {
    val df = run("q32_range_join")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")), s"got $ops")
  }

  test("runtime bloom filter injects into a selective fact-fact shuffle " +
      "join (row-level runtime filtering is live for 100 TB shapes)") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local SFs sit under the production thresholds (10 MB creation /
      // 10 GB application scan) — force them down so the rule fires here;
      // a real cluster hits the defaults naturally at fact-table scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // broadcast-able dims don't need runtime filters; model the
      // fact-fact case where both sides shuffle
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = graft.Tables(spark, sf0001)
      val sellers = t.lineitem.filter(col("l_discount") >= 0.09)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val df = t.orders.join(sellers, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q50: large-large interval join is a pure equi-join on (user, bin) " +
      "— no cartesian, no nested-loop, no post-join dedup shuffle") {
    val df = run("q50_interval_join")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!PlanChecks.usesCartesianProduct(df), s"got $ops")
    assert(!ops.exists(_.startsWith("BroadcastNestedLoopJoin")), s"got $ops")
    // two join-input exchanges + per-user aggregate (+ AQE may keep the
    // output sort's exchange); the first-common-bin emit predicate means
    // no distinct/dedup stage exists between join and aggregate
    assert(PlanChecks.countDataShuffles(df) <= 5,
      s"shuffles = ${PlanChecks.countDataShuffles(df)}")
  }

  test("m05: video near-dup candidates are group-and-expand on the frame " +
      "fingerprint — no cartesian; frame-count joins stay keyed") {
    val df = run("m05_video_neardup")
    assert(!PlanChecks.usesCartesianProduct(df))
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!ops.exists(_.startsWith("BroadcastNestedLoopJoin")), s"got $ops")
  }

  test("s10: filtered ANN scores via the label equi-join (constraint IS " +
      "the join key — never a cross join + post-filter)") {
    val df = run("s10_ann_filtered")
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(PlanChecks.usesBroadcastJoin(df),
      "query panel should broadcast into the label-keyed join")
  }

  test("d02: candidate generation is single-shuffle group-and-expand — " +
      "the exploded shingle rows shuffle once into the collect_list gather " +
      "and NO join ever touches them (the old self-join shuffled them twice)") {
    val df = run("d02_dedup_ngram_jaccard")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!ops.exists(o => o.startsWith("ShuffledHashJoin")
        || o.startsWith("SortMergeJoin")),
      s"exploded-side join crept back in; got $ops")
    assert(ops.exists(_.startsWith("ObjectHashAggregate")),
      s"per-shingle collect_list gather missing; got $ops")
    // base repartition + shingle gather + pair agg + output sort
    val n = PlanChecks.countDataShuffles(df)
    assert(n <= 4, s"d02 planned $n data shuffles (expected ≤ 4)")
  }

  test("d17: cross-doc span candidates are group-and-expand on the gram " +
      "hash — no join ever touches the exploded gram rows, never cartesian") {
    val df = run("d17_crossdoc_spans")
    assert(!PlanChecks.usesCartesianProduct(df))
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!ops.exists(o => o.startsWith("ShuffledHashJoin")
        || o.startsWith("SortMergeJoin") || o.startsWith("BroadcastHashJoin")),
      s"a join crept into the gram pipeline; got $ops")
    // spread + gram gather + diagonal window + pair agg + output sort
    val n = PlanChecks.countDataShuffles(df)
    assert(n <= 6, s"d17 planned $n data shuffles (expected ≤ 6)")
  }

  test("d19: incremental span scrub probes the corpus gram index with an " +
      "equi-join on the 8-byte hash — never cartesian, batch-proportional") {
    val df = run("d19_incremental_span_scrub")
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("d04: native simhash32 keeps fingerprinting map-side — only the " +
      "documentsSpread repartition and the output sort exchange data") {
    assert(PlanChecks.countDataShuffles(run("d04_dedup_simhash")) <= 2)
  }

  test("s02: native hyperplane_bucket signatures add no aggregate " +
      "shuffles — the only exchanges are the spread, the bucket join " +
      "sides, and the output ordering") {
    assert(PlanChecks.countDataShuffles(run("s02_ann_lsh_bucketed")) <= 5)
  }

  test("s01: ANN scoring keeps whole-stage codegen (dot_f64 generates)") {
    assert(PlanChecks.hasWholeStageCodegen(run("s01_ann_bruteforce")))
  }

  test("s03: the fixed-k centroid side broadcasts (constant-size at any " +
      "corpus scale) and centroid selection is TakeOrdered, not a global " +
      "sort") {
    val df = run("s03_ann_ivf")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")),
      s"centroid assignment must broadcast the centroid side; got $ops")
    assert(PlanChecks.usesTakeOrdered(df),
      "fixed-k centroid sampling must compile to TakeOrderedAndProject")
  }

  test("s05: Lloyd assignment passes broadcast the k-centroid side " +
      "(constant-size at any corpus scale) and seed selection is " +
      "TakeOrdered, not a global sort") {
    val df = run("s05_kmeans_clusters")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")),
      s"centroid assignment must broadcast the centroid side; got $ops")
    assert(PlanChecks.usesTakeOrdered(df),
      "hash-sampled seed selection must compile to TakeOrderedAndProject")
  }

  test("s18: the persisted-index probe broadcasts the loaded k-row " +
      "centroid frame and joins postings on the cell id — never " +
      "cartesian, no index-rebuild window over the corpus") {
    val df = run("s18_ann_persisted_index")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!PlanChecks.usesCartesianProduct(df))
    // the O(Q·k) centroid assignment (a broadcast of the loaded k-row
    // centroids) runs INSIDE probeIndex's cached-RDD assignment —
    // exactly once for the cell collect and the join — so the final
    // plan starts at the RDD leaf, not the assignment subtree (the
    // assignment subtree's own broadcast discipline is pinned
    // separately in AnnIndexSpec via probeAssignment)
    assert(ops.exists(s => s.contains("RDDScan") || s.contains("Scan" +
      "Existing") || s == "RDDScanExec" || s.contains("ExistingRDD")),
      s"the cached assignment frame must feed the probe; got $ops")
    // the probe side's window ranks only the tiny query batch; the
    // corpus-side candidates arrive via the cell equi-join from the
    // loaded postings with the Q·nprobe assignment side BROADCAST —
    // a shuffled join here would exchange the corpus-scale postings
    assert(PlanChecks.usesBroadcastJoin(df),
      s"cell probe must broadcast the assignment side; got $ops")
    // the postings scan must be pruned to the probed cells — the
    // read-side point of the cell-partitioned layout AnnIndex builds.
    // probePersisted plants a literal IN over the k-bounded probed-cell
    // set (measured: relying on broadcast-DPP instead, AQE's
    // result-stage re-planning degraded the subquery to `true` and the
    // scan read all 32 partitions)
    val pruned = PlanChecks.partitionedScansPruned(df)
    assert(pruned.nonEmpty,
      "s18 must scan the cell-partitioned postings layout")
    assert(pruned.forall(identity),
      "every postings scan must carry a selective cell partition filter")
    // 9 query vectors × nprobe=2 bounds the probed set at 18 of the 32
    // cells — an unpruned scan reads all 32
    val read = PlanChecks.partitionsRead(df)
    assert(read > 0 && read <= 18,
      s"postings scan must read only the probed cells' partitions " +
        s"(<=18 of 32); read $read")
  }

  test("s19: EVERY leg of the delta-chain postings union is " +
      "partition-pruned to the probed cells (pruning through the " +
      "multi-root union, not just its first leg)") {
    val df = run("s19_ann_delta_index")
    val pruned = PlanChecks.partitionedScansPruned(df)
    assert(pruned.size >= 2,
      s"s19 loads a full+delta chain — expected >=2 partitioned " +
        s"postings scans, got ${pruned.size}")
    assert(pruned.forall(identity),
      "each chain leg's postings scan must carry a selective cell " +
        "partition filter — an unpruned leg re-scans that root's " +
        "every cell at 100 TB")
    val read = PlanChecks.partitionsRead(df)
    assert(read > 0 && read <= 36,
      s"the two chain roots must each read only probed cells " +
        s"(<=18 each of 32); read $read")
  }

  test("s20: the compacted chain serves from ONE postings root (compact " +
      "restored the single-root layout) and that root's scan is pruned " +
      "to the probed cells") {
    val df = run("s20_ann_compacted_index")
    val pruned = PlanChecks.partitionedScansPruned(df)
    assert(pruned.size == 1,
      s"after compact the probe must read a single postings root; " +
        s"got ${pruned.size} partitioned scans")
    assert(pruned.forall(identity),
      "the compacted root's scan must carry a selective cell filter")
    val read = PlanChecks.partitionsRead(df)
    assert(read > 0 && read <= 18,
      s"compacted postings scan must read only probed cells; read $read")
  }

  test("d10: SemDeDup within-cluster scoring is an equi-join on the " +
      "cluster id, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d10_semantic_dedup")))
  }

  test("d09: LSH-bucketed embedding near-dup candidates come from an " +
      "equi-join on bucket, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d09_dedup_embedding_lsh")))
  }

  test("d12: incremental fuzzy dedup is two keyed hops (band semi-join, " +
      "id anti-join) — no cartesian, no window, no pairwise stage") {
    val df = run("d12_incremental_fuzzy_dedup")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(!ops.exists(_.startsWith("Window")), s"unexpected window: $ops")
  }

  test("p03: the mixture weight table broadcasts (config-size side) and " +
      "no cartesian product appears") {
    val df = run("p03_mixture_epochs")
    assert(PlanChecks.usesBroadcastJoin(df),
      "weight table must broadcast — it is O(sources) config data")
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("s06: PQ codebook broadcasts (M·Ks rows at any corpus scale), seed " +
      "selection is TakeOrdered, and the ADC scan broadcasts the query side") {
    val df = run("s06_ann_pq_adc")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(PlanChecks.usesBroadcastJoin(df),
      s"codebook encoding join must broadcast; got $ops")
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")),
      s"ADC scan must broadcast the query side; got $ops")
    assert(PlanChecks.usesTakeOrdered(df),
      "hash-sampled codebook seeds must compile to TakeOrderedAndProject")
  }

  test("s07: IVF-PQ probes candidates via an equi-join on the cell id " +
      "(never cartesian) with constant-size broadcast support structures") {
    val df = run("s07_ann_ivf_pq")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")),
      s"centroid assignment must broadcast the fixed-k centroid side; got $ops")
    assert(PlanChecks.usesBroadcastJoin(df),
      s"PQ codebook joins must broadcast; got $ops")
    assert(PlanChecks.usesTakeOrdered(df),
      "centroid/codebook seed sampling must compile to TakeOrderedAndProject")
  }

  test("t08: the contamination probe set broadcasts; the corpus side " +
      "streams through without a doc-vs-doc pairing") {
    val df = run("t08_contamination")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("d13: repeated-span detection joins on the gram hash — keyed " +
      "equi-joins only, nothing pairwise") {
    assert(!PlanChecks.usesCartesianProduct(run("d13_repeated_spans")))
  }

  test("x10: the DSIR weight table broadcasts (≤256 rows at any corpus " +
      "scale) and the top-100 cut is TakeOrdered, not a global sort") {
    val df = run("x10_dsir_resample")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(PlanChecks.usesTakeOrdered(df))
  }

  test("t11: char-entropy is per-row array math — shuffle-free up to the " +
      "spread repartition and the output sort") {
    assert(PlanChecks.countShuffles(run("t11_char_entropy")) <= 2)
  }

  test("s08: recall join is keyed by vec_id on both bucket lookups — " +
      "only the intended broadcast pairing on the sampled query panel") {
    val df = run("s08_ann_recall")
    assert(PlanChecks.usesBroadcastJoin(df))
  }

  test("s14: the nprobe sweep's candidate pass is a cell equi-join and " +
      "per-level numbers come from the tiny level-table broadcast — the " +
      "only pairing is the intended panel ground truth") {
    val df = run("s14_ivf_probe_sweep")
    assert(PlanChecks.usesBroadcastJoin(df))
  }

  test("d20: SimHash gate candidates come from the (band, byte) equi-join " +
      "and truth from the shingle group-and-expand — never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d20_simhash_recall")))
  }

  test("m03: the blockhash signature is one per-row fold — shuffles are " +
      "only the spread repartition, the bucket aggregate, and the output " +
      "sort") {
    val df = run("m03_blockhash_neardup")
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(PlanChecks.countShuffles(df) <= 3)
  }

  test("d14: CDC chunk dedup joins on the chunk hash — keyed equi-joins " +
      "only, nothing pairwise") {
    assert(!PlanChecks.usesCartesianProduct(run("d14_cdc_chunks")))
  }

  test("q43/q44: sessionize and sweep-line plan no join at all — windows " +
      "partitioned by user, never a pairwise interval formulation") {
    Seq("q43_sessionize", "q44_interval_concurrency").foreach { n =>
      val ops = PlanChecks.physical(run(n)).map(_.getClass.getSimpleName)
      assert(!ops.exists(_.contains("Join")), s"$n planned a join: $ops")
    }
  }

  test("t12: tf-idf is join-free on the term side (df via window, not a " +
      "vocabulary join) — the only join is the broadcast of the 1-row " +
      "corpus count") {
    val df = run("t12_tfidf_keywords")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!ops.exists(o => o.startsWith("ShuffledHashJoin")
        || o.startsWith("SortMergeJoin")), s"vocabulary join crept in: $ops")
    // the 1-row corpus-count cross join broadcasts as a nested-loop —
    // the right physical op for a single-row build side
    assert(ops.exists(_.startsWith("BroadcastNestedLoopJoin")), s"got $ops")
  }

  test("p08: bloom prefilter runs map-side inside the scan stage; the " +
      "exact confirm joins survivors only via broadcast") {
    val df = run("p08_bloom_decontaminate")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"),
      "bloom_contains prefilter missing from the physical plan")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("p21: the decontamination decision is map-side (no join at all) " +
      "and the plan_fence keeps it ABOVE the spreading repartition — " +
      "pushed below, the whole per-doc gram recompute serializes onto " +
      "the single pre-shuffle scan task (measured 10x)") {
    val df = run("p21_exact_set_decontaminate")
    val nodes = PlanChecks.physical(df)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Join")),
      "p21 must not join — the decision is one map-side predicate")
    val fenced = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("plan_fence") => f
    }
    assert(fenced.nonEmpty, "the fenced decontamination filter is gone")
    // structural check: the fenced filter's subtree must contain the
    // spreading exchange — or a cached relation (built post-repartition,
    // so an InMemoryTableScan preserves the spread; another spec's p08
    // cache canonically matches p21's base and legitimately serves it).
    // What must NEVER appear directly under the fence is the bare
    // single-split file scan.
    def subtreeHasSpread(p: org.apache.spark.sql.execution.SparkPlan)
        : Boolean = {
      def walk(x: org.apache.spark.sql.execution.SparkPlan): Boolean =
        x match {
          // a shuffle stage (fresh or REUSED from an earlier query over
          // the same subtree) IS the repartition exchange
          case _: org.apache.spark.sql.execution.adaptive
              .ShuffleQueryStageExec => true
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case e if e.isInstanceOf[
              org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] =>
            true
          case e if e.getClass.getSimpleName
              .startsWith("InMemoryTableScan") => true
          case e => e.children.exists(walk)
        }
      p.children.exists(walk)
    }
    assert(fenced.forall(subtreeHasSpread),
      "the fenced filter was pushed below the repartition exchange:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("d16: containment candidates reuse the join-free group-and-expand — " +
      "no join touches the exploded shingle rows, no cartesian") {
    val df = run("d16_containment_neardup")
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(ops.exists(_.startsWith("ObjectHashAggregate")),
      s"per-shingle gather missing; got $ops")
  }

  test("a12/a13: funnel and retention plan no join — ordering constraints " +
      "and cohort days come from user-partitioned windows, not self-joins") {
    Seq("a12_funnel", "a13_retention_cohorts").foreach { n =>
      val ops = PlanChecks.physical(run(n)).map(_.getClass.getSimpleName)
      assert(!ops.exists(_.contains("Join")), s"$n planned a join: $ops")
    }
  }

  test("s09: exact re-rank joins the ADC shortlist back by vec_id — " +
      "equi-joins only, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("s09_ann_rerank")))
  }

  test("s11: binary-code rerank joins the Hamming shortlist back as " +
      "broadcast equi-joins — the float math never sees a cartesian") {
    val df = run("s11_ann_binary")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("t18: the global token distribution broadcasts into the per-source " +
      "KL join — vocabulary-bounded frames, no cartesian blowup") {
    val df = run("t18_source_divergence")
    assert(PlanChecks.usesBroadcastJoin(df))
    assert(!PlanChecks.usesCartesianProduct(df))
  }

  test("x12: weighted sample selection is TakeOrderedAndProject — " +
      "per-partition k, no global sort, no window") {
    assert(PlanChecks.usesTakeOrdered(run("x12_weighted_sample")))
  }

  test("t20: BPE pair top-k is TakeOrderedAndProject over the " +
      "vocabulary-bounded pair aggregate") {
    assert(PlanChecks.usesTakeOrdered(run("t20_bpe_pairs")))
  }

  test("s12/t21: prefix-dim rerank and source-similarity pairs are keyed " +
      "joins — no cartesian") {
    Seq("s12_ann_prefix_dims", "t21_source_similarity").foreach { n =>
      assert(!PlanChecks.usesCartesianProduct(run(n)), s"$n planned cartesian")
    }
  }

  test("t19/p12: vocabulary-growth and dataset card plan keyed joins " +
      "only — no cartesian anywhere") {
    Seq("t19_vocab_growth", "p12_dataset_card").foreach { n =>
      assert(!PlanChecks.usesCartesianProduct(run(n)), s"$n planned cartesian")
    }
  }

  test("a20: EWMA gathers the trailing frame in ONE user-partitioned " +
      "window — no join, no self-join on the series") {
    val ops = PlanChecks.physical(run("a20_ewma_smoothing"))
      .map(_.getClass.getSimpleName)
    assert(!ops.exists(_.contains("Join")), s"a20 planned a join: $ops")
  }

  test("s15: multi-probe candidates come from the bucket equi-join — the " +
      "probe explode stays on the panel-sized query side, never cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("s15_ann_multiprobe")))
  }

  test("d21: b-bit calibration keeps d11's keyed topology — banded pair " +
      "generation plus per-pair array math, no cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("d21_bbit_minhash")))
  }

  test("p15: snapshot diff is ONE keyed full-outer join over (id, hash) " +
      "projections — no cartesian, text collapsed to md5 before the join") {
    val df = run("p15_corpus_diff")
    assert(!PlanChecks.usesCartesianProduct(df))
    val ops = PlanChecks.physical(df).map(_.getClass.getSimpleName)
    assert(ops.count(_.contains("SortMergeJoin")) +
      ops.count(_.contains("ShuffledHashJoin")) +
      ops.count(_.contains("BroadcastHashJoin")) == 1,
      s"p15 should plan exactly one join: $ops")
  }

  test("q51: the skew profile is two keyed aggregates — no join anywhere " +
      "(the pre-flight must be cheaper than the join it advises)") {
    val ops = PlanChecks.physical(run("q51_join_skew_profile"))
      .map(_.getClass.getSimpleName)
    assert(!ops.exists(_.contains("Join")), s"q51 planned a join: $ops")
  }

  test("d22/t23: threshold sweep and posting lists keep keyed topologies — " +
      "no cartesian; t23's panel probe broadcasts") {
    assert(!PlanChecks.usesCartesianProduct(run("d22_jaccard_threshold_sweep")))
    val df = run("t23_posting_lists")
    assert(!PlanChecks.usesCartesianProduct(df))
    assert(PlanChecks.usesBroadcastJoin(df))
  }

  test("q52/x14: the cardinality pre-flight joins count tables (never the " +
      "facts) and the rolling-origin table broadcasts — no cartesian") {
    assert(!PlanChecks.usesCartesianProduct(run("q52_join_cardinality_preflight")))
    val ops = PlanChecks.physical(run("x14_rolling_origin_split"))
      .map(_.getClass.getSimpleName)
    assert(!ops.contains("CartesianProductExec") &&
      ops.exists(_.startsWith("Broadcast")),
      s"x14 should broadcast the origin table: $ops")
  }

  test("round-6 topologies stay keyed: d24's edit-distance verify is " +
      "candidates-bounded (no cartesian), d25's naive hamming predicate " +
      "plans as ONE posexplode block equi-join with a single scan per " +
      "side, q53 broadcasts parents, s17's MMR stages never go cartesian " +
      "past the panel probe") {
    assert(!PlanChecks.usesCartesianProduct(run("d24_edit_distance_verify")))
    val d25 = run("d25_hamming_block_join")
    assert(!PlanChecks.usesCartesianProduct(d25),
      "rewrite must remove the cartesian")
    val d25Plan = d25.queryExecution.executedPlan.toString
    assert(!d25Plan.contains("Union"),
      "round-7 rewrite: single join, not a branch union")
    assert(d25Plan.contains("graft_bidx"),
      "expected the pigeonhole posexplode blocks")
    // self-contained: each side reads the documents scan ONCE, with no
    // caller-side cache (was the r6 design-note gap)
    val d25Scans = PlanChecks.countParquetScans(d25)
    assert(d25Scans <= 2, s"expected ≤2 parquet scans, saw $d25Scans")
    val q53 = run("q53_fk_orphans")
    assert(!PlanChecks.usesCartesianProduct(q53))
    assert(PlanChecks.usesBroadcastJoin(q53), "parents should broadcast")
    // s17: the panel×corpus score is an intentional broadcast probe (s01's
    // shape); everything AFTER the shortlist must be keyed — no
    // CartesianProductExec anywhere (broadcast nested loop on the tiny
    // panel is the allowed form)
    assert(!PlanChecks.usesCartesianProduct(run("s17_mmr_rerank")))
  }

  test("d27: the naive arrays_overlap theta join plans as the TWO-PHASE " +
      "pair-list topology (SetOverlapJoinRewrite round 8) — slim hashed " +
      "candidate explode, distinct rowid pairs, payload back-joins; no " +
      "cartesian, no nested loop, each side scanned at most twice " +
      "(once slim for candidates, once full for payloads — d02's own " +
      "re-read discipline)") {
    val d27 = run("d27_overlap_join_rewrite")
    assert(!PlanChecks.usesCartesianProduct(d27))
    val plan = d27.queryExecution.executedPlan.toString
    assert(plan.contains("graft_elem"),
      s"overlap rewrite must fire:\n$plan")
    assert(plan.contains("graft_prid"),
      s"two-phase pair-list shape expected at this size:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"no |L|·|R| array comparisons:\n$plan")
    val scans = PlanChecks.countParquetScans(d27)
    assert(scans <= 4, s"expected ≤4 parquet scans (2 per side), saw $scans")
    // the exploded candidate rows must be slim: no array-typed column
    // may cross the candidate exchange (the whole point of two-phase)
    val genRows = plan.linesIterator.filter(_.contains("graft_elem")).toSeq
    assert(genRows.nonEmpty)
  }

  test("d28: the naive array_contains tag-lookup join plans as the " +
      "exploded membership equi-join — no nested loop over the panel") {
    val d28 = run("d28_membership_join")
    assert(!PlanChecks.usesCartesianProduct(d28))
    val plan = d28.queryExecution.executedPlan.toString
    assert(plan.contains("graft_member_elem"),
      s"membership rewrite must fire:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"no per-document panel scans:\n$plan")
  }

  test("d29/d30: the naive LeftSemi overlap and LeftAnti hamming " +
      "decontamination spellings plan as slim rowid probes + back " +
      "semi/anti (round-8 rewrite paths) — no nested loop, no " +
      "cartesian; d31's preflight joins count tables only") {
    val d29 = run("d29_semi_overlap_decontam")
    assert(!PlanChecks.usesCartesianProduct(d29))
    val p29 = d29.queryExecution.executedPlan.toString
    assert(!p29.contains("NestedLoop"),
      s"semi overlap rewrite must fire:\n$p29")
    assert(p29.contains("graft_"), s"rewrite artifacts expected:\n$p29")
    val d30 = run("d30_anti_hamming_decontam")
    assert(!PlanChecks.usesCartesianProduct(d30))
    val p30 = d30.queryExecution.executedPlan.toString
    assert(!p30.contains("NestedLoop"),
      s"anti hamming rewrite must fire (naive anti broadcasts a nested " +
        s"loop):\n$p30")
    assert(p30.contains("graft_bidx"),
      s"expected posexplode blocks:\n$p30")
    val d31 = run("d31_overlap_preflight")
    assert(!PlanChecks.usesCartesianProduct(d31))
    assert(!d31.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }

  test("d32-d36: the round-8 prefix/Jaccard/anti/wide gating queries keep the " +
      "rewritten shapes — no cartesian, no nested loop; d33's naive " +
      "all-pairs Jaccard self-join follows d27's ≤2-scans-per-side " +
      "discipline; the anti gates end in the rowid back-anti") {
    val d32 = run("d32_overlap_threshold_prefix")
    assert(!PlanChecks.usesCartesianProduct(d32))
    val p32 = d32.queryExecution.executedPlan.toString
    assert(!p32.contains("NestedLoop"), s"threshold rewrite must fire:\n$p32")
    assert(p32.contains("graft_elem"), s"exploded prefix keys:\n$p32")
    val d33 = run("d33_jaccard_theta_rewrite")
    assert(!PlanChecks.usesCartesianProduct(d33))
    val p33 = d33.queryExecution.executedPlan.toString
    assert(!p33.contains("NestedLoop"),
      s"jaccard rewrite must fire (naive is |docs|² array compares):\n$p33")
    assert(p33.contains("graft_prid"),
      s"two-phase pair-list shape expected at this size:\n$p33")
    val d33Scans = PlanChecks.countParquetScans(d33)
    assert(d33Scans <= 4, s"expected ≤4 parquet scans, saw $d33Scans")
    val d34 = run("d34_anti_threshold_scrub")
    assert(!PlanChecks.usesCartesianProduct(d34))
    val p34 = d34.queryExecution.executedPlan.toString
    assert(!p34.contains("NestedLoop"),
      s"anti threshold rewrite must fire:\n$p34")
    assert(p34.contains("graft_prid"), s"pair-verify shape:\n$p34")
    // twoPhaseSemiVerify's documented cost: the source relation is
    // scanned exactly 3x (slim probe, verify rows, payload back-join —
    // the banned side rides scan/exchange reuse, every scan is
    // column-pruned, and the joins the scans feed are broadcast; SCALE.md
    // quantifies the split at sf0.1). MORE means reuse broke (a 4th scan
    // at 100 TB is a full extra pass); FEWER means someone introduced a
    // cache — re-measure before trusting either.
    val d34Scans = PlanChecks.countParquetScans(d34)
    assert(d34Scans == 3,
      s"d34: expected exactly 3 parquet scans, saw $d34Scans:\n$p34")
    val d35 = run("d35_anti_membership_quarantine")
    assert(!PlanChecks.usesCartesianProduct(d35))
    val p35 = d35.queryExecution.executedPlan.toString
    assert(!p35.contains("NestedLoop"),
      s"anti membership rewrite must fire:\n$p35")
    assert(p35.contains("graft_member_elem"), s"explode shape:\n$p35")
    // d36: the wide text payload must route hamming through the slim
    // pair-list (never (k+1)x-replicated through the block exchange)
    val d36 = run("d36_hamming_wide_payload")
    assert(!PlanChecks.usesCartesianProduct(d36))
    val p36 = d36.queryExecution.executedPlan.toString
    assert(!p36.contains("NestedLoop"), s"hamming rewrite must fire:\n$p36")
    assert(p36.contains("graft_prid"),
      s"wide payload must take the two-phase pair-list:\n$p36")
    assert(p36.contains("graft_bidx"), s"posexplode blocks expected:\n$p36")
  }

  test("d43/d44: the >=-Jaccard semi/anti gates take the rowid-union " +
      "rewrite (witnessed two-phase ∪ empty-matched rowids) — never the " +
      "naive nested-loop, and the final rowid back semi/anti finalizes " +
      "as a broadcast under AQE") {
    // d45 is d43's EXISTS-subquery spelling: its semi join only EXISTS
    // after the late RewriteSubquery batch, so its pin certifies the
    // post-subquery rule registration keeps the same plan shape
    for ((name, joinType) <- Seq(
        ("d43_orequal_semi_decontam", "LeftSemi"),
        ("d44_orequal_anti_scrub", "LeftAnti"),
        ("d45_exists_subquery_decontam", "LeftSemi"),
        ("d46_notexists_subquery_scrub", "LeftAnti"))) {
      val df = run(name)
      assert(!PlanChecks.usesCartesianProduct(df))
      val p = df.queryExecution.executedPlan.toString
      // the ONLY nested loop the rewrite leaves is the condition-less
      // empty×empty broadcast cross (tiny filtered subsets; priced by
      // the d42 preflight) — a nested loop still carrying the Jaccard
      // predicate means the rewrite did NOT fire (e.g. a gram spelling
      // that types containsNull=true) and the plan is |corpus|×|banned|
      // array compares
      val nlj = p.linesIterator.filter(_.contains("NestedLoopJoin")).toSeq
      assert(nlj.forall(!_.contains("array_intersect")),
        s"$name: the >= rewrite must fire (a nested loop still carries " +
          s"the naive Jaccard predicate):\n$p")
      assert(nlj.size <= 1,
        s"$name: at most the empty-empty cross may nested-loop:\n$p")
      assert(p.contains("graft_"), s"$name: rewrite artifacts expected:\n$p")
      assert(PlanChecks.countSortMergeJoins(df) == 0,
        s"$name: a back-join is shuffling both sides:\n$p")
      assert(PlanChecks.broadcastHashJoinTypes(df).contains(joinType),
        s"$name: the final rowid back-join must be a broadcast $joinType:\n$p")
    }
  }

  test("two-phase back-joins finalize as BROADCAST hash joins — never a " +
      "sort-merge that shuffles the payload side with the tiny pair/rowid " +
      "set (the 100 TB property the pair-list topology leans on; AQE " +
      "must convert once the aggregate's true size is known)") {
    // d36: two payload back-joins onto the pair-list; d34: two verify
    // back-joins plus the final rowid back-anti; d29: the rowid back-semi
    val wanted = Seq(
      ("d36_hamming_wide_payload", 2),
      ("d34_anti_threshold_scrub", 3),
      ("d29_semi_overlap_decontam", 1))
    for ((name, minBroadcasts) <- wanted) {
      val df = run(name)
      val smj = PlanChecks.countSortMergeJoins(df)
      assert(smj == 0,
        s"$name: $smj sort-merge join(s) survived AQE — a back-join is " +
          s"shuffling both sides:\n${df.queryExecution.executedPlan}")
      val bhj = PlanChecks.broadcastHashJoinTypes(df)
      assert(bhj.size >= minBroadcasts,
        s"$name: expected >= $minBroadcasts broadcast back-joins, " +
          s"saw $bhj:\n${df.queryExecution.executedPlan}")
    }
    // the anti/semi back-join specifically must be the broadcast one
    assert(PlanChecks.broadcastHashJoinTypes(
        run("d34_anti_threshold_scrub")).contains("LeftAnti"),
      "d34's final rowid back-anti must plan as a broadcast")
    assert(PlanChecks.broadcastHashJoinTypes(
        run("d29_semi_overlap_decontam")).contains("LeftSemi"),
      "d29's rowid back-semi must plan as a broadcast")
  }

  test("no registered query plans an unpartitioned window (the whole-table-" +
      "through-one-task shape) or a CartesianProductExec (|L|·|R| without " +
      "even a broadcast bound)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val ws = PlanChecks.unpartitionedWindows(df)
        .map(w => s"$name [window]: $w") ++
        (if (PlanChecks.usesCartesianProduct(df))
          Seq(s"$name [cartesian]") else Nil)
      ws
    }
    assert(offenders.isEmpty,
      s"scale-hostile operators in:\n  ${offenders.mkString("\n  ")}")
  }
}
