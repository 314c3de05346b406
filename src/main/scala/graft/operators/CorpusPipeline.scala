package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{MinHashFamily, MinHashSig, StableHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship composed operator: an end-to-end training-corpus
  * construction pipeline over `documents` —
  *
  *   1. quality gate (t02's transcendental-free score ≥ 0.3)
  *   2. exact dedup (canonical = min doc_id per md5(lower(text)))
  *   3. fuzzy dedup (MinHash-LSH candidate pairs, greedy keep-lowest-id:
  *      any doc appearing as the higher id of a candidate pair is dropped)
  *   4. per-doc stats for the surviving corpus
  *
  * Every stage is one of the separately-oracle-verified operators (t02,
  * d01, d03) composed declaratively, so Catalyst plans the whole pipeline
  * as one DAG — the quality filter prunes before any shingle explode, and
  * the three dedup structures are keyed joins (no pairwise stage).
  *
  * Scale: this is the shape of a real 100 TB curation run — stage order is
  * chosen so the most selective cheap filter (quality) runs first against
  * the scan, exact dedup collapses identical bytes before the expensive
  * shingle work, and the LSH join only sees survivors.
  */
object CorpusPipeline {

  private def p01(s: SparkSession, dir: String): DataFrame =
    p01From(QualityScore.scored(Tables(s, dir).documentsSpread))

  /** p01 over an already-scored frame (doc_id, lang, text, toks,
    * n_tokens, quality_score) — split out so p05 can feed the SHARED
    * scan+spread+tokenize subtree it caches for its contamination
    * branch instead of re-running the whole stage (the two branches
    * independently paid scan + repartition + split before). */
  private def p01From(scoredDocs: DataFrame): DataFrame = {
    val docs = scoredDocs.filter(col("quality_score") >= 0.3)

    // exact dedup: survivors are the canonical (min) id per content hash
    val canonical = docs
      .groupBy(md5(lower(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // cached: feeds both the shingle/LSH branch and the final anti-join.
    // Pruned BEFORE caching (p08/t15's discipline): the LSH branch reads
    // toks and the final projection (doc_id, lang, n_tokens,
    // quality_score) — caching text + n_stop too would pin the whole
    // corpus payload for no consumer.
    val exactKept = docs.join(canonical, "doc_id")
      .select(col("doc_id"), col("lang"), col("toks"), col("n_tokens"),
        col("quality_score"))
      .cache()

    // fuzzy dedup: minhash-LSH pairs among exact survivors; greedy drop of
    // every higher-id member of a candidate pair
    // all 16 sigs in one native codegen'd pass (MinHashSig: one md5 digest
    // per shingle + the shared (a_i·x + b_i) mod p universal family) — see
    // DedupOps.minhashPairs / MinHashFamily for construction and bounds
    // NO array_distinct before the sigs (round 16, guide §4): the 16
    // family minimums are idempotent over duplicate shingles (verified
    // bit-identical on the real corpus) and the per-row string hash set
    // was half the stage's CPU — DedupOps.shingleStringsFromToks is THE
    // spelling (shared with the d03/d15 band builder, can't fork).
    val sig = DedupOps.shingleStringsFromToks(exactKept)
      .withColumn("sigs", MinHashSig.minhashSigs(col("sh_arr")))
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        concat_ws("-", (0 until 4).map(r => col("sigs").getItem(b * 4 + r)): _*)
          .as("bsig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    // greedy drop = every non-minimal id in any (band, bsig) bucket. One
    // groupBy gathers each bucket's sorted id list and slice() emits all
    // but the head — the same set the old band self-join produced as the
    // pairs' b-side, with one shuffle instead of two and no cache.
    val dropIds = bands.groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr("slice(ids, 2, size(ids) - 1)")).as("doc_id"))
      .distinct()

    exactKept.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val p01Sql = {
    val h = s"(a * x + b) % ${MinHashFamily.p}"
    val sigCols = (0 until 16)
      .map(i => s"min(CASE WHEN seed = $i THEN h END) AS m$i").mkString(",\n    ")
    val bandRows = (0 until 4).map { b =>
      val cat = (0 until 4).map(r => s"CAST(m${b * 4 + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $cat AS bsig FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    ${QualityScore.duckNTokens} AS n_tokens,
       |    ${QualityScore.duckNStop(QualityScore.duckToks)} AS n_stop
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id, lang, text, n_tokens,
       |    ${QualityScore.duckScore()} AS quality_score
       |  FROM scored
       |  WHERE ${QualityScore.duckScore()} >= 0.3),
       |canonical AS (
       |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(lower(text))),
       |kept AS (
       |  SELECT q.* FROM quality q JOIN canonical c ON q.doc_id = c.doc_id),
       |toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM kept
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(w) - 1),
       |        i -> concat(w[CAST(i AS INT)], ' ', w[CAST(i AS INT) + 1],
       |          ' ', w[CAST(i AS INT) + 2]))) AS shingle
       |    FROM toks) u),
       |shh AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS x
       |  FROM sh),
       |minh AS (
       |  SELECT doc_id, seed, min($h) AS h
       |  FROM shh, (VALUES ${MinHashFamily.duckSeedRows(16)})
       |    seeds(seed, a, b)
       |  GROUP BY doc_id, seed),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM minh GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |drop_ids AS (
       |  SELECT DISTINCT y.doc_id
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id)
       |SELECT k.doc_id, k.lang, k.n_tokens, k.quality_score
       |FROM kept k
       |WHERE NOT EXISTS (SELECT 1 FROM drop_ids d WHERE d.doc_id = k.doc_id)
       |ORDER BY k.doc_id""".stripMargin
  }

  /** Token-budget packing (data-mixing stage): per language, admit documents
    * in quality order until a 5,000-token budget is exhausted — the greedy
    * knapsack every training-mix pipeline runs after curation. One window
    * (partitioned by lang, ordered by quality desc with doc_id tiebreak)
    * computes the running token total; a doc is admitted iff the budget was
    * not already spent before it. Partitioned by the mixing key, so at
    * 100 TB each language's scan+sort is independent — no global order. */
  private def p02(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    QualityScore.scored(Tables(s, dir).documentsSpread)
      .filter(col("quality_score") >= 0.3)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < 5000)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val p02Sql =
    s"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    ${QualityScore.duckNTokens} AS n_tokens,
      |    ${QualityScore.duckNStop(QualityScore.duckToks)} AS n_stop
      |  FROM documents),
      |quality AS (
      |  SELECT doc_id, lang, n_tokens,
      |    ${QualityScore.duckScore()} AS quality_score
      |  FROM scored
      |  WHERE ${QualityScore.duckScore()} >= 0.3),
      |packed AS (
      |  SELECT doc_id, lang, n_tokens, quality_score,
      |    sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY quality_score DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM quality)
      |SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  quality_score
      |FROM packed
      |WHERE cum_tokens - n_tokens < 5000
      |ORDER BY doc_id""".stripMargin

  /** Source-weighted mixture with fractional epoch repeats — the data-mixing
    * stage that turns a curated corpus into a training mix (reference scope
    * ends at message processing; this is north-star training-pipeline
    * surface). Each source carries a weight in permille (2500 = 2.5 epochs):
    * every doc is emitted `wp div 1000` times, plus one more iff its stable
    * content hash lands below `wp mod 1000` of 1000 — so a 2.5-epoch source
    * repeats every doc twice and a deterministic, content-chosen half of it
    * a third time. Integer permille arithmetic end-to-end: no float
    * thresholds to drift between engines, and the same doc gets the same
    * copy count at any SF or cluster size (resumable, auditable).
    *
    * Scale shape: the weight table broadcasts (it is a config, O(sources));
    * copy counts are map-side expressions; the explode multiplies rows by
    * exactly the intended output epochs — there is no intermediate larger
    * than the mixture being built. No shuffle until the caller aggregates
    * or writes. */
  def mixtureEpochs(docs: DataFrame, weightsPermille: DataFrame,
      defaultPermille: Int = 1000): DataFrame =
    docs.join(broadcast(weightsPermille), Seq("source"), "left")
      .withColumn("wp", coalesce(col("w_permille"), lit(defaultPermille)))
      .withColumn("n_copies",
        expr("wp div 1000") +
          when(StableHash.h60(col("text")) % 1000 < col("wp") % 1000, 1L)
            .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .withColumn("copy",
        explode(expr("sequence(CAST(1 AS BIGINT), n_copies)")))

  /** Declared mixture query: up-weight src1/src2 (2.5 / 2 epochs),
    * down-sample src0/src3, leave the rest at 1 epoch; report the realized
    * per-source mix (docs in/out, tokens out, achieved epochs). */
  private def p03(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val weights = Seq(("src0", 300), ("src1", 2500), ("src2", 2000),
      ("src3", 500)).toDF("source", "w_permille")
    val docs = Tables(s, dir).documentsSpread
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val inCounts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_in"))
    mixtureEpochs(docs, weights)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_out"),
        sum(col("n_tokens")).as("n_tokens_out"))
      .join(inCounts, Seq("source"))
      .withColumn("realized_epochs",
        round(col("n_docs_out") / col("n_docs_in").cast("double"), 4))
      .select(col("source"), col("n_docs_in"), col("n_docs_out"),
        col("n_tokens_out"), col("realized_epochs"))
      .orderBy(col("source"))
  }

  private val p03Sql =
    s"""WITH spec(source, w_permille) AS (VALUES
       |  ('src0', 300), ('src1', 2500), ('src2', 2000), ('src3', 500)),
       |d AS (
       |  SELECT doc.source, doc_id,
       |    ${QualityScore.duckNTokens} AS n_tokens,
       |    coalesce(w_permille, 1000) AS wp,
       |    (${StableHash.duckH60("text")}) % 1000 AS h
       |  FROM documents doc LEFT JOIN spec USING (source)),
       |c AS (
       |  SELECT source, doc_id, n_tokens,
       |    wp // 1000 + CASE WHEN h < wp % 1000 THEN 1 ELSE 0 END AS n_copies
       |  FROM d),
       |mixed AS (
       |  SELECT source, n_tokens,
       |    unnest(generate_series(1, n_copies)) AS copy
       |  FROM c),
       |outc AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_out,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens_out
       |  FROM mixed GROUP BY source),
       |inc AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_in
       |  FROM documents GROUP BY source)
       |SELECT source, n_docs_in, n_docs_out, n_tokens_out,
       |  round(n_docs_out / CAST(n_docs_in AS DOUBLE), 4) AS realized_epochs
       |FROM outc JOIN inc USING (source)
       |ORDER BY source""".stripMargin

  /** Deterministic training-shard assignment — the shard-building step
    * before a webdataset/TFRecord-style export. Docs hash into [[nShards]]
    * shards (content hash, so the same doc lands in the same shard at any
    * SF or cluster size) and are ordered within each shard by the
    * curriculum key (quality desc, id tiebreak) with a within-shard
    * position. The window partitions by shard: at 100 TB every shard sorts
    * independently — the physical export is `repartition($"shard")
    * .sortWithinPartitions(...)` and no global order exists anywhere. */
  private val nShards = 8

  private def p04(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    QualityScore.scored(Tables(s, dir).documentsSpread)
      .withColumn("shard", StableHash.h60(col("text")) % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("n_tokens"),
        col("quality_score"))
      .orderBy(col("shard"), col("pos"))
  }

  private val p04Sql =
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    ${QualityScore.duckNTokens} AS n_tokens,
       |    ${QualityScore.duckNStop(QualityScore.duckToks)} AS n_stop,
       |    (${StableHash.duckH60("text")}) % $nShards AS shard
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_tokens, shard,
       |    ${QualityScore.duckScore()} AS quality_score
       |  FROM scored)
       |SELECT shard, CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY quality_score DESC, doc_id) AS BIGINT) AS pos,
       |  doc_id, n_tokens, quality_score
       |FROM q
       |ORDER BY shard, pos""".stripMargin

  /** Decontaminated training corpus — the final gate a corpus passes
    * before training: the curated p01 output minus (a) the benchmark
    * documents themselves (doc_id < 20 stand in for the eval set) and
    * (b) every document sharing ANY 5-gram with them (t08's contamination
    * criterion). The probe-gram set is benchmark-sized, so it broadcasts;
    * the corpus side streams through one map-side gram explode and a
    * broadcast semi-join — decontamination adds no shuffle beyond the
    * per-doc distinct-gram collapse already inherent to the check. */
  private def p05(s: SparkSession, dir: String): DataFrame = {
    // ONE scan + spread + tokenize subtree feeds BOTH branches
    // (contamination grams AND the p01 curation pipeline): before, each
    // branch re-ran the whole stage independently — plan-internal
    // subtree reuse does not exist in Spark (the s17/d11 fan-out
    // class). Cached pruned to the consumed columns (text for the
    // exact-dedup md5 + lang for the final projection + the shared
    // toks). Same clearCache() honesty as every operator cache: the
    // bench evicts it before every timed pass.
    val base = QualityScore.tokenize(Tables(s, dir).documentsSpread)
      .select(col("doc_id"), col("lang"), col("text"), col("toks"))
      .cache()
    val grams = ContaminationGrams.explodedFromToks(base)
      // cached: probe-set build and corpus-side contamination join both
      // consume the exploded gram hashes (8-byte rows)
      .cache()
    val probe = grams.filter(col("doc_id") < 20).select(col("g")).distinct()
    val contaminated = grams.filter(col("doc_id") >= 20)
      .join(broadcast(probe), Seq("g"))
      .select(col("doc_id")).distinct()
    p01From(QualityScore.scoredFromToks(base))
      .filter(col("doc_id") >= 20)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  private val p05Sql =
    s"""WITH curated AS ($p01Sql),
       |gr AS (
       |  SELECT DISTINCT doc_id, gram FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
       |      i -> concat(w[CAST(i AS INT)], ' ', w[CAST(i AS INT) + 1], ' ',
       |        w[CAST(i AS INT) + 2], ' ', w[CAST(i AS INT) + 3], ' ',
       |        w[CAST(i AS INT) + 4]))) AS gram
       |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
       |    WHERE len(w) >= 5) u),
       |probe AS (SELECT DISTINCT gram FROM gr WHERE doc_id < 20),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM gr JOIN probe USING (gram)
       |  WHERE doc_id >= 20)
       |SELECT c.* FROM curated c
       |WHERE c.doc_id >= 20
       |  AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
       |ORDER BY c.doc_id""".stripMargin

  /** Per-source document cap — the anti-domination stage web-corpus
    * pipelines run after curation (CommonCrawl-derived sets cap documents
    * per registered domain so no single crawler-friendly site floods the
    * mix; `source` stands in for the domain here). Keep the top
    * [[sourceCap]] documents per source by quality (t02's
    * transcendental-free score) with a doc_id tiebreak, and report each
    * kept doc's rank — downstream mixing reads the rank to apply
    * source-level temperature.
    *
    * Scale: ONE window partitioned by the cap key — per-source work is
    * cluster-local and the shuffle is keyed by source; no global order
    * until the bounded output sort. Skewed mega-sources are the known
    * hazard; the mitigation (pre-filter each source's obvious tail with a
    * per-partition partial top-k before the window) composes in front
    * without changing this operator's contract. */
  private val sourceCap = 15

  private def p06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = QualityScore.scored(Tables(s, dir).documentsSpread)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= sourceCap)
      .select(col("source"), col("rk"), col("doc_id"), col("quality_score"))
      .orderBy(col("source"), col("rk"))
  }

  private val p06Sql =
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    ${QualityScore.duckNTokens} AS n_tokens,
       |    ${QualityScore.duckNStop(QualityScore.duckToks)} AS n_stop
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id,
       |    ${QualityScore.duckScore()} AS quality_score
       |  FROM scored)
       |SELECT source, rk, doc_id, quality_score FROM (
       |  SELECT source, doc_id, quality_score,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk
       |  FROM ranked) t
       |WHERE rk <= $sourceCap
       |ORDER BY source, rk""".stripMargin

  /** Dataset-card mix report — the per-(source, language) composition
    * table every released corpus publishes: doc and token counts at
    * (source, lang), per-source, and grand-total grains (one Expand via
    * grouping sets, not three scans), with each row's token share in
    * integer permille of the grand total (integer arithmetic — no float
    * division to drift between engines; the 1-row total broadcasts).
    *
    * Scale: grouping sets over low-cardinality keys = one partial-agg
    * shuffle with #sources × #langs × 3 groups; everything else is
    * map-side. The report over 100 TB costs one corpus scan. */
  private def p07(s: SparkSession, dir: String): DataFrame = {
    // fixed view name + drop after analysis: sql() resolves the plan
    // eagerly, so the returned frame no longer needs the catalog entry —
    // a UUID-suffixed view per invocation leaked one catalog entry per
    // run for the session lifetime
    val v = "graft_p07_mix_docs"
    Tables(s, dir).documentsSpread
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .createOrReplaceTempView(v)
    try s.sql(
      s"""WITH grains AS (
         |  SELECT coalesce(source, 'ALL') AS source,
         |    coalesce(lang, 'ALL') AS lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |  FROM $v
         |  GROUP BY GROUPING SETS ((source, lang), (source), ())),
         |total AS (
         |  SELECT n_tokens AS total_tokens FROM grains
         |  WHERE source = 'ALL' AND lang = 'ALL')
         |SELECT g.source, g.lang, g.n_docs, g.n_tokens,
         |  CAST(g.n_tokens * 1000 DIV t.total_tokens AS BIGINT)
         |    AS share_permille
         |FROM grains g CROSS JOIN total t
         |ORDER BY g.source, g.lang""".stripMargin)
    finally s.catalog.dropTempView(v)
  }

  private val p07Sql =
    """WITH grains AS (
      |  SELECT coalesce(source, 'ALL') AS source,
      |    coalesce(lang, 'ALL') AS lang,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents
      |  GROUP BY GROUPING SETS ((source, lang), (source), ())),
      |total AS (
      |  SELECT n_tokens AS total_tokens FROM grains
      |  WHERE source = 'ALL' AND lang = 'ALL')
      |SELECT g.source, g.lang, g.n_docs, g.n_tokens,
      |  CAST(g.n_tokens * 1000 // t.total_tokens AS BIGINT) AS share_permille
      |FROM grains g CROSS JOIN total t
      |ORDER BY g.source, g.lang""".stripMargin

  /** Bloom-prefiltered benchmark decontamination — p05's semantics at the
    * probe scale where a broadcast-hash semi-join stops fitting.
    *
    * p05/t08 broadcast the probe gram-hash set into an equi-join: exact,
    * but every executor holds the full probe relation, and a union of
    * benchmark suites can reach 10^8+ distinct grams. Here the probe set
    * is compacted to a Bloom filter (~10 bits/key, 1-2 orders smaller)
    * probed by the native `bloom_contains` expression INSIDE the per-doc
    * gram array — `exists(gram_hashes, g -> bloom_contains(g))` — so the
    * corpus-side prefilter is pure map-side codegen: no explode, no
    * shuffle, no join for the overwhelmingly-clean majority of documents.
    *
    * Bloom false positives cannot corrupt the result: every prefilter
    * survivor is re-confirmed by the exact broadcast semi-join (now over
    * survivors' grams only — a vanishing fraction of the corpus), and
    * false negatives are impossible, so output ≡ p05's exact
    * contamination set. The oracle runs the exact formulation; any bloom
    * bug that leaked a contaminated doc (or dropped a clean one) breaks
    * the hash match.
    *
    * Output: the clean (non-contaminated) corpus documents with their
    * distinct-gram counts. */
  private def p08(s: SparkSession, dir: String): DataFrame = {
    // cached: the gram-hash arrays feed four consumers (bloom build, exact
    // probe set, prefilter scan, output projection) — without the cache the
    // shingle/hash computation re-runs per consumer (measured 11 s → ~3 s
    // at sf0.1). The cache holds (doc_id, lang, ghashes) only — text and
    // toks are dropped first.
    val base = ContaminationGrams.perDoc(Tables(s, dir).documentsSpread,
      keep = Seq("lang"))
      .cache()
    val probeBloom = graft.functions.BloomContains.build(
      base.filter(col("doc_id") < 20)
        .select(explode(col("ghashes")).as("g")))
    val corpus = base.filter(col("doc_id") >= 20)
    val hits = corpus.filter(exists(col("ghashes"),
      g => graft.functions.BloomContains.bloomContains(g, probeBloom)))
    val probeExact = base.filter(col("doc_id") < 20)
      .select(explode(col("ghashes")).as("g")).distinct()
    val contaminated = hits
      .select(col("doc_id"), explode(col("ghashes")).as("g"))
      .join(broadcast(probeExact), Seq("g"))
      .select(col("doc_id")).distinct()
    corpus
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(col("ghashes")).cast("long").as("n_grams"))
      .orderBy(col("doc_id"))
  }

  private val p08Sql =
    """WITH gr AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
      |      i -> concat(w[CAST(i AS INT)], ' ', w[CAST(i AS INT) + 1], ' ',
      |        w[CAST(i AS INT) + 2], ' ', w[CAST(i AS INT) + 3], ' ',
      |        w[CAST(i AS INT) + 4]))) AS gram
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
      |    WHERE len(w) >= 5) u),
      |probe AS (SELECT DISTINCT gram FROM gr WHERE doc_id < 20),
      |contaminated AS (
      |  SELECT DISTINCT doc_id FROM gr JOIN probe USING (gram)
      |  WHERE doc_id >= 20)
      |SELECT d.doc_id, d.lang,
      |  (SELECT CAST(count(DISTINCT gram) AS BIGINT) FROM gr
      |   WHERE gr.doc_id = d.doc_id) AS n_grams
      |FROM documents d
      |WHERE d.doc_id >= 20
      |  AND len(string_split(d.text, ' ')) >= 5
      |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      |ORDER BY d.doc_id""".stripMargin

  /** Per-epoch deterministic reshuffle order — multi-epoch training must
    * present the corpus in a DIFFERENT order each epoch (epoch-identical
    * order biases optimization), yet the order must be reproducible for
    * restarts and for cross-engine parity. Order key =
    * `h60(doc_id || ':' || epoch)`: content-derived, so epoch 0 and
    * epoch 1 get independent permutations and any engine re-derives the
    * same ones.
    *
    * Scale design: position assignment is a window partitioned by
    * (epoch, shard) — every shard × epoch orders independently
    * (cluster-local), and the export is
    * `repartition(shard).sortWithinPartitions(pos)`, never a global sort
    * (p04's discipline applied per epoch). 3 epochs × 4 shards here;
    * output limited to shard 0 to keep the oracle frame small while
    * still crossing epochs. */
  private def p09(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir).documentsSpread
      .select(col("doc_id"))
    val epochs = docs.crossJoin(
      s.range(0, 3).select(col("id").as("epoch")))
    val keyed = epochs
      .withColumn("okey",
        StableHash.h60(concat(col("doc_id"), lit(":"), col("epoch"))))
      .withColumn("shard", (col("okey") % 4).cast("long"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("okey"), col("doc_id"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("shard") === 0)
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("epoch"), col("pos"))
  }

  private val p09Sql = {
    val h = StableHash.duckH60("doc_id || ':' || epoch")
    s"""WITH e AS (
       |  SELECT doc_id, epoch FROM documents,
       |    (SELECT unnest(range(3)) AS epoch) ep),
       |keyed AS (
       |  SELECT doc_id, epoch, $h AS okey, ($h) % 4 AS shard FROM e)
       |SELECT epoch, CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY epoch, shard
       |    ORDER BY okey, doc_id) AS BIGINT) AS pos,
       |  doc_id
       |FROM keyed
       |WHERE shard = 0
       |ORDER BY epoch, pos""".stripMargin
  }

  /** Sequence packing — concat-and-chop into fixed context-length training
    * examples (the step between a curated corpus and a token loader: docs
    * are concatenated in a deterministic shuffled order and sliced into
    * `ctxLen`-token windows; a doc may straddle a window boundary). Per doc
    * we emit its shard, pack position, first sequence id, offset inside
    * that sequence, and how many boundaries it straddles — everything a
    * loader needs to locate any document inside the packed stream, and
    * everything an auditor needs to re-derive the packing.
    *
    * Scale design: a GLOBAL concatenation order is inherently sequential
    * (one running sum), so packing is per shard — the same discipline real
    * pipelines use (each writer packs its own output shard). The shard key
    * is the stable content hash (p04's), the intra-shard order is an
    * epoch-shuffle hash (p09's), and the running token sum is a window
    * partitioned by shard — cluster-local, no global order anywhere.
    * Waste is bounded: at most `ctxLen − 1` tokens of the final partial
    * sequence per shard. */
  private val p10CtxLen = 512
  private val p10Shards = 8
  private def p10(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables(s, dir).documentsSpread
      .withColumn("n_tokens",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("okey",
        StableHash.h60(concat(col("doc_id"), lit(":pack"))))
      .withColumn("shard", (col("okey") % p10Shards).cast("long"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("okey"), col("doc_id"))
    val cum = Window.partitionBy(col("shard"))
      .orderBy(col("okey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cum))
      .withColumn("prev_tokens", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        expr(s"prev_tokens div $p10CtxLen").as("start_seq"),
        (col("prev_tokens") % p10CtxLen).cast("long").as("offset_in_seq"),
        expr(s"(cum_tokens - 1) div $p10CtxLen " +
          s"- prev_tokens div $p10CtxLen").as("n_boundary_crossings"))
      .orderBy(col("doc_id"))
  }

  private val p10Sql = {
    val h = StableHash.duckH60("doc_id || ':pack'")
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    ${QualityScore.duckNTokens} AS n_tokens,
       |    $h AS okey, ($h) % $p10Shards AS shard
       |  FROM documents),
       |packed AS (
       |  SELECT doc_id, shard, n_tokens, okey,
       |    row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id)
       |      AS pos,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY okey, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM keyed)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(pos AS BIGINT) AS pos, n_tokens,
       |  CAST((cum_tokens - n_tokens) // $p10CtxLen AS BIGINT) AS start_seq,
       |  CAST((cum_tokens - n_tokens) % $p10CtxLen AS BIGINT)
       |    AS offset_in_seq,
       |  CAST((cum_tokens - 1) // $p10CtxLen
       |    - (cum_tokens - n_tokens) // $p10CtxLen AS BIGINT)
       |    AS n_boundary_crossings
       |FROM packed
       |ORDER BY doc_id""".stripMargin
  }

  /** Water-filling token-budget allocation across sources: given a corpus
    * budget B (60% of total tokens here), find the unique level L with
    * Σ_s min(T_s, L) = B and give every source min(T_s, L) tokens — the
    * max-min-fair mixture balancer (small sources keep everything, big
    * sources are clipped to a common ceiling instead of pro-rata-starving
    * the tail). p06's fixed per-source cap is the special case where L is
    * chosen by hand; this computes the budget-exact level.
    *
    * Scale: per-source token totals are ONE map-side-combined aggregate
    * over the corpus (shuffle rows = |sources|); the level solve then
    * runs on a single row holding the sorted |sources|-element array —
    * one fold: at each boundary k the candidate level
    * (B − prefix_{k−1})/(n − k + 1) is valid iff it lands between
    * T_{k−1} and T_k, and monotonicity makes exactly one boundary valid.
    * No iteration, no driver loop, and no unpartitioned window (the
    * whole-table-through-one-task shape the ScaleGuards rule exists to
    * kill): the only single-task frame is the |sources|-sized array,
    * which is tiny by construction at any corpus scale. All comparisons
    * happen on exact integer counts and the single IEEE division both
    * engines compute identically. */
  private def p11(s: SparkSession, dir: String): DataFrame = {
    val tot = Tables(s, dir).documentsSpread
      .select(col("source"), size(split(col("text"), " ")).cast("long")
        .as("n_toks"))
      .groupBy(col("source")).agg(sum(col("n_toks")).as("toks"))
    val solved = tot
      .agg(sort_array(collect_list(struct(col("toks"), col("source"))))
          .as("ts"),
        sum(col("toks")).as("tot_toks"), count(lit(1)).as("n"))
      .withColumn("b", floor(col("tot_toks") * 0.6d).cast("long"))
      .withColumn("level", expr(
        """aggregate(sequence(1, CAST(n AS INT)),
          |  named_struct('pfx', 0L, 'prev', 0L,
          |    'lvl', CAST(NULL AS DOUBLE)),
          |  (acc, k) -> named_struct(
          |    'pfx', acc.pfx + ts[k - 1].toks,
          |    'prev', ts[k - 1].toks,
          |    'lvl', CASE WHEN acc.lvl IS NULL
          |        AND CAST(acc.prev AS DOUBLE)
          |          <= (b - acc.pfx) / CAST(n - k + 1 AS DOUBLE)
          |        AND (b - acc.pfx) / CAST(n - k + 1 AS DOUBLE)
          |          <= CAST(ts[k - 1].toks AS DOUBLE)
          |      THEN (b - acc.pfx) / CAST(n - k + 1 AS DOUBLE)
          |      ELSE acc.lvl END),
          |  acc -> acc.lvl)""".stripMargin))
      .select(col("level"))
    tot.join(broadcast(solved), lit(true))
      .select(col("source"), col("toks").as("tokens"),
        round(least(col("toks").cast("double"), col("level")), 4)
          .as("alloc_tokens"),
        (col("toks").cast("double") > col("level")).as("capped"))
      .orderBy(col("source"))
  }

  private val p11Sql =
    """WITH tot AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY source),
      |budget AS (
      |  SELECT CAST(floor(sum(toks) * 0.6) AS BIGINT) AS b,
      |    count(*) AS n FROM tot),
      |ranked AS (
      |  SELECT source, toks, b, n,
      |    row_number() OVER (ORDER BY toks ASC, source ASC) AS k,
      |    sum(toks) OVER (ORDER BY toks ASC, source ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
      |    lag(toks, 1, 0) OVER (ORDER BY toks ASC, source ASC) AS prev_t
      |  FROM tot CROSS JOIN budget),
      |lvl AS (
      |  SELECT min((b - (pfx - toks)) / CAST(n - k + 1 AS DOUBLE)) AS level
      |  FROM ranked
      |  WHERE CAST(prev_t AS DOUBLE)
      |      <= (b - (pfx - toks)) / CAST(n - k + 1 AS DOUBLE)
      |    AND (b - (pfx - toks)) / CAST(n - k + 1 AS DOUBLE)
      |      <= CAST(toks AS DOUBLE))
      |SELECT source, toks AS tokens,
      |  round(least(CAST(toks AS DOUBLE), level), 4) AS alloc_tokens,
      |  CAST(toks AS DOUBLE) > level AS capped
      |FROM tot CROSS JOIN lvl
      |ORDER BY source""".stripMargin

  /** Per-source dataset card: the summary table a curation run publishes
    * with its output — volume (docs/tokens), duplication exposure (share
    * of docs whose exact hash repeats ANYWHERE in the corpus, so
    * cross-source mirrors are charged to both sides), mean quality
    * (t02's rational score), and language composition. One row per
    * source; p07's mix report covers the post-selection mixture, this
    * audits the raw inventory.
    *
    * Scale: one pass computes every per-doc signal map-side (quality,
    * token count, lang flag, content hash); duplication needs the only
    * extra structure — a corpus-wide hash→count aggregate (map-side
    * combined, output = distinct hashes) broadcast-joined back by hash.
    * The final per-source aggregate is |sources| rows. No windows, no
    * pairwise anything. */
  private def p12(s: SparkSession, dir: String): DataFrame = {
    val docs = QualityScore.scored(Tables(s, dir).documentsSpread,
        scoreCol = "q")
      .withColumn("q4", round(col("q") * 10000).cast("long"))
      .withColumn("h", md5(lower(col("text"))))
    // NO broadcast hint: hashCounts has one row per DISTINCT document —
    // O(corpus) cardinality, not a dimension table. A forced broadcast
    // would collect the whole dedup table to the driver and pin a copy
    // on every executor at 100 TB; the plain shuffle join on the md5
    // key is the scale shape (t10/t12 use the same pattern for their
    // count lookups).
    val hashCounts = docs.groupBy(col("h")).agg(count(lit(1)).as("n_copies"))
    docs.join(hashCounts, "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")) / count(lit(1)).cast("double"), 4)
          .as("avg_doc_tokens"),
        round(sum(when(col("n_copies") > 1, 1L).otherwise(0L))
          / count(lit(1)).cast("double"), 4).as("pct_dup_exposed"),
        round(sum(col("q4")) / (count(lit(1)) * 10000.0d), 4)
          .as("mean_quality"),
        round(sum(when(col("lang") === "en", 1L).otherwise(0L))
          / count(lit(1)).cast("double"), 4).as("pct_en"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source"))
  }

  private val p12Sql = {
    // the ONE formula, spelled over direct len() expressions (this CTE
    // has no n_tokens/n_stop aliases in scope at q's position)
    val q = QualityScore.duckScore(
      nStop = QualityScore.duckNStop("string_split(text, ' ')"),
      nTokens = "len(string_split(text, ' '))")
    s"""WITH d AS (
      |  SELECT source, lang, md5(lower(text)) AS h,
      |    ${QualityScore.duckNTokens} AS n_tokens,
      |    $q AS q,
      |    CAST(round($q * 10000) AS BIGINT) AS q4
      |  FROM documents),
      |hc AS (SELECT h, count(*) AS n_copies FROM d GROUP BY h)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  round(sum(n_tokens) / CAST(count(*) AS DOUBLE), 4)
      |    AS avg_doc_tokens,
      |  round(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE), 4) AS pct_dup_exposed,
      |  round(sum(q4) / (count(*) * 10000.0), 4) AS mean_quality,
      |  round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE), 4) AS pct_en,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM d JOIN hc USING (h)
      |GROUP BY source
      |ORDER BY source""".stripMargin
  }

  /** Reproducibility manifest: per training shard (p04's hash assignment),
    * doc/token counts plus an ORDER-FREE content checksum (bit-XOR of
    * per-doc 60-bit content hashes) — the artifact two independent
    * pipeline runs compare to prove they produced identical shards, and
    * the fastest possible divergence locator when they didn't (only
    * mismatched shards need re-inspection). Published beside the shard
    * files; the dataset-card (p12) describes the corpus, this fingerprints
    * it.
    *
    * Scale: one map-side pass computes each doc's hash and shard; the
    * manifest is a |shards|-row aggregate whose XOR/sum combiners are
    * commutative — any partitioning, any cluster size, same manifest.
    * That commutativity is the point: a content checksum that required an
    * ordered fold would force a global sort just to fingerprint. */
  private def p13(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documentsSpread
      .withColumn("h", StableHash.h60(col("text")))
      .withColumn("shard", pmod(col("h"), lit(8)).cast("long"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(h)").as("content_xor"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  private val p13Sql = {
    val h = StableHash.duckH60("text")
    s"""SELECT shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(bit_xor(h) AS BIGINT) AS content_xor,
       |  min(doc_id) AS min_doc,
       |  max(doc_id) AS max_doc
       |FROM (
       |  SELECT doc_id, $h AS h, ($h) % 8 AS shard,
       |    ${QualityScore.duckNTokens} AS n_tokens
       |  FROM documents) d
       |GROUP BY shard
       |ORDER BY shard""".stripMargin
  }

  /** Quality-annealed curriculum order — schedule each source's documents
    * cleanest-first: phase 1 = that source's top quality tercile, phase 3
    * its noisiest, with a deterministic content-hash shuffle INSIDE each
    * phase (annealed ≠ sorted: feeding docs in strict quality order
    * correlates adjacent batches; the hash shuffle decorrelates them while
    * the phase boundary preserves the easy→hard ramp). Complements p09:
    * that reshuffles uniformly per epoch, this biases the order by a
    * per-doc quality signal (vocabulary richness — distinct/total token
    * ratio, the cheap lexical-diversity proxy).
    *
    * Scale design: terciles are PER SOURCE via ntile over a window
    * partitioned by source — a global ntile would be a global sort of the
    * corpus (the one shape the layout rules here forbid); per-source
    * banding is also the curriculum practice (each source ramps on its own
    * quality scale, so a uniformly-noisy source still spreads across
    * phases). Both windows are source-partitioned (cluster-local sorts);
    * the export order is lexicographic (source, phase, pos) — a loader
    * streams phase files in name order, no global sort ever materializes.
    * Ties (equal rounded quality) break on doc_id in both engines. */
  private def p14(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir).documentsSpread
      .withColumn("toks", split(col("text"), " "))
      .withColumn("quality", round(
        size(array_distinct(col("toks")))
          / size(col("toks")).cast("double"), 4))
    val byQ = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    val phased = docs
      .withColumn("phase", ntile(3).over(byQ).cast("long"))
      .withColumn("okey", StableHash.h60(concat(col("doc_id"), lit(":cur"))))
    val w = Window.partitionBy(col("source"), col("phase"))
      .orderBy(col("okey"), col("doc_id"))
    phased
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("source"), col("phase"), col("pos"), col("doc_id"),
        col("quality"))
      .orderBy(col("source"), col("phase"), col("pos"))
  }

  private val p14Sql = {
    val h = StableHash.duckH60("doc_id || ':cur'")
    s"""WITH q AS (
       |  SELECT doc_id, source,
       |    round(len(list_distinct(string_split(text, ' ')))
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS quality
       |  FROM documents),
       |phased AS (
       |  SELECT doc_id, source, quality,
       |    CAST(ntile(3) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id) AS BIGINT) AS phase,
       |    $h AS okey
       |  FROM q)
       |SELECT source, phase,
       |  CAST(row_number() OVER (PARTITION BY source, phase
       |    ORDER BY okey, doc_id) AS BIGINT) AS pos,
       |  doc_id, quality
       |FROM phased
       |ORDER BY source, phase, pos""".stripMargin
  }

  /** Corpus snapshot diff — the audit a versioned corpus publishes with
    * every release: which documents were added, removed, or changed (and
    * how much content moved) between snapshot v1 and v2. Run before
    * training on a refreshed corpus, this is what catches a silently
    * truncated source or an upstream re-crawl that rewrote half a domain.
    * The two snapshots here are deterministic slices of `documents`:
    * v1 = doc_id % 13 ≠ 5 (some docs not yet crawled), v2 = doc_id % 11 ≠ 3
    * (some docs dropped since) with every doc_id % 7 = 2 text revised —
    * so all four statuses appear at any SF.
    *
    * Scale design: each side collapses to (doc_id, source, content hash,
    * size) AT THE SCAN — the text never shuffles, only its md5 does. The
    * diff is ONE full-outer equi-join on doc_id (co-partitioned by the
    * join key; at 100 TB both snapshots would be bucketed by doc_id on
    * disk, making this join shuffle-free), statuses are a map-side CASE,
    * and the report is a keyed aggregate over (status, source) with
    * map-side partials. No window, no pairwise stage; cost is O(corpus)
    * with one shuffle each side. */
  private def p15(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documentsSpread
    def snap(df: DataFrame): DataFrame = df.select(
      col("doc_id"), col("source"), md5(col("text")).as("h"),
      length(col("text")).cast("long").as("n"))
    val v1 = snap(docs.filter(col("doc_id") % 13 =!= 5))
    val v2 = snap(
      docs.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))))
    v1.select(col("doc_id"), col("source").as("s1"), col("h").as("h1"),
        col("n").as("n1"))
      .join(v2.select(col("doc_id"), col("source").as("s2"),
        col("h").as("h2"), col("n").as("n2")), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged"))
      .withColumn("source", coalesce(col("s2"), col("s1")))
      .groupBy(col("status"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n2"), lit(0L)) - coalesce(col("n1"), lit(0L)))
          .as("chars_delta"))
      .orderBy(col("status"), col("source"))
  }

  private val p15Sql =
    """WITH v1 AS (
      |  SELECT doc_id, source, md5(text) AS h, length(text) AS n
      |  FROM documents WHERE doc_id % 13 <> 5),
      |v2 AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' [rev2]' ELSE text END)
      |      AS h,
      |    length(CASE WHEN doc_id % 7 = 2 THEN text || ' [rev2]' ELSE text
      |      END) AS n
      |  FROM documents WHERE doc_id % 11 <> 3),
      |diff AS (
      |  SELECT coalesce(v2.source, v1.source) AS source,
      |    CASE WHEN v1.h IS NULL THEN 'added'
      |         WHEN v2.h IS NULL THEN 'removed'
      |         WHEN v1.h <> v2.h THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    coalesce(v2.n, 0) - coalesce(v1.n, 0) AS delta
      |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      |SELECT status, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(delta) AS BIGINT) AS chars_delta
      |FROM diff GROUP BY status, source
      |ORDER BY status, source""".stripMargin

  /** Length-bucketed batching audit — the padding-efficiency report for
    * the OTHER packing regime beside p10's concat-and-split: when examples
    * must stay whole (SFT, contrastive pairs), batches pad every sequence
    * to a bucket capacity, and wasted-token share is the metric that
    * decides the bucket boundaries. Buckets are powers of two (floor 32):
    * capacity(n) = 2^ceil(log2 n) via binary-string length — integer-exact
    * in both engines (t10's floor-log2 discipline). Per bucket: docs,
    * real tokens, padding tokens, and the waste share in permille.
    *
    * Scale: capacity is per-row integer math at the scan; the report is
    * ONE hash aggregate over ≤ ~20 buckets — map-side partials collapse
    * each partition to the bucket count first. */
  private def p16(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documentsSpread
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cap", greatest(lit(32L),
        expr("shiftleft(1L, length(bin(n_tokens - 1)))")))
      .groupBy(col("cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("cap") - col("n_tokens")).as("pad_tokens"))
      .withColumn("waste_permille",
        expr("pad_tokens * 1000 div (n_docs * cap)"))
      .orderBy(col("cap"))

  private val p16Sql =
    s"""WITH d AS (
      |  SELECT ${QualityScore.duckNTokens} AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT n_tokens,
      |    greatest(32, CAST(pow(2, len(bin(n_tokens - 1))) AS BIGINT))
      |      AS cap
      |  FROM d)
      |SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(sum(cap - n_tokens) AS BIGINT) AS pad_tokens,
      |  CAST(sum(cap - n_tokens) * 1000 // (count(*) * cap) AS BIGINT)
      |    AS waste_permille
      |FROM c GROUP BY cap
      |ORDER BY cap""".stripMargin

  /** Data-contract audit — declarative constraint verification in the
    * Deequ/Great-Expectations shape: a suite of named expectations per
    * table (uniqueness, completeness, enum membership, referential
    * consistency, range/length thresholds), ALL evaluated in ONE
    * hash-aggregate pass per table (each rule is a `sum(case when violated
    * then 1)` leg of the same agg), then unpivoted to a per-rule report
    * row: n_checked, n_violations, pass. The ingest gate a 100 TB pipeline
    * runs before promoting a crawl batch — cost is exactly one scan per
    * audited table regardless of rule count, output is O(rules), and each
    * rule is integer-exact (no float in any decision). Threshold rules
    * (min length, value ceiling) report real nonzero violation counts,
    * proving the audit counts rather than rubber-stamps. */
  private def p17(s: SparkSession, dir: String): DataFrame = {
    val tb = Tables(s, dir)
    val langs = Seq("de", "en", "es", "fr", "zh")
    val types = Seq("view", "click", "purchase", "signup", "error")
    val docRules = tb.documents
      .agg(
        count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("doc_id_unique"),
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("text_nonblank"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("n_chars_consistent"),
        sum(when(!col("lang").isin(langs: _*), 1L).otherwise(0L))
          .as("lang_in_enum"),
        sum(when(col("n_chars") < 50, 1L).otherwise(0L))
          .as("text_min_50_chars"))
      .selectExpr("'documents' AS tbl", "n_checked",
        """stack(5,
          |  'doc_id_unique', doc_id_unique,
          |  'lang_in_enum', lang_in_enum,
          |  'n_chars_consistent', n_chars_consistent,
          |  'text_min_50_chars', text_min_50_chars,
          |  'text_nonblank', text_nonblank) AS (rule, n_violations)"""
          .stripMargin)
    val evRules = tb.events
      .agg(
        count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("event_id_unique"),
        sum(when(!col("event_type").isin(types: _*), 1L).otherwise(0L))
          .as("event_type_in_enum"),
        sum(when(col("value").isNull || isnan(col("value"))
          || col("value") < 0, 1L).otherwise(0L)).as("value_nonnegative"),
        sum(when(col("value") > 400, 1L).otherwise(0L))
          .as("value_max_400"),
        sum(when(col("ts").isNull
          || col("ts") < to_timestamp(lit("2024-01-01"))
          || col("ts") >= to_timestamp(lit("2025-01-01")), 1L)
          .otherwise(0L)).as("ts_in_2024"),
        sum(when(col("user_id").isNull || col("user_id") < 0, 1L)
          .otherwise(0L)).as("user_id_valid"))
      .selectExpr("'events' AS tbl", "n_checked",
        """stack(6,
          |  'event_id_unique', event_id_unique,
          |  'event_type_in_enum', event_type_in_enum,
          |  'ts_in_2024', ts_in_2024,
          |  'user_id_valid', user_id_valid,
          |  'value_max_400', value_max_400,
          |  'value_nonnegative', value_nonnegative) AS (rule, n_violations)"""
          .stripMargin)
    docRules.unionAll(evRules)
      .select(col("tbl"), col("rule"), col("n_checked"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("tbl"), col("rule"))
  }

  private val p17Sql =
    """WITH d AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
      |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS r_unique,
      |    CAST(count(*) FILTER (WHERE text IS NULL OR trim(text) = '')
      |      AS BIGINT) AS r_blank,
      |    CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
      |      AS r_nchars,
      |    CAST(count(*) FILTER (WHERE lang NOT IN
      |      ('de','en','es','fr','zh')) AS BIGINT) AS r_lang,
      |    CAST(count(*) FILTER (WHERE n_chars < 50) AS BIGINT) AS r_min50
      |  FROM documents),
      |e AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
      |    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS r_unique,
      |    CAST(count(*) FILTER (WHERE event_type NOT IN
      |      ('view','click','purchase','signup','error')) AS BIGINT)
      |      AS r_enum,
      |    CAST(count(*) FILTER (WHERE value IS NULL OR isnan(value)
      |      OR value < 0) AS BIGINT) AS r_nonneg,
      |    CAST(count(*) FILTER (WHERE value > 400) AS BIGINT) AS r_max400,
      |    CAST(count(*) FILTER (WHERE ts IS NULL
      |      OR ts < TIMESTAMP '2024-01-01'
      |      OR ts >= TIMESTAMP '2025-01-01') AS BIGINT) AS r_ts,
      |    CAST(count(*) FILTER (WHERE user_id IS NULL OR user_id < 0)
      |      AS BIGINT) AS r_user
      |  FROM events)
      |SELECT tbl, rule, n_checked, n_violations, n_violations = 0 AS pass
      |FROM (
      |  SELECT 'documents' AS tbl, 'doc_id_unique' AS rule, n_checked,
      |    r_unique AS n_violations FROM d
      |  UNION ALL SELECT 'documents', 'lang_in_enum', n_checked, r_lang FROM d
      |  UNION ALL SELECT 'documents', 'n_chars_consistent', n_checked,
      |    r_nchars FROM d
      |  UNION ALL SELECT 'documents', 'text_min_50_chars', n_checked,
      |    r_min50 FROM d
      |  UNION ALL SELECT 'documents', 'text_nonblank', n_checked,
      |    r_blank FROM d
      |  UNION ALL SELECT 'events', 'event_id_unique', n_checked,
      |    r_unique FROM e
      |  UNION ALL SELECT 'events', 'event_type_in_enum', n_checked,
      |    r_enum FROM e
      |  UNION ALL SELECT 'events', 'ts_in_2024', n_checked, r_ts FROM e
      |  UNION ALL SELECT 'events', 'user_id_valid', n_checked, r_user FROM e
      |  UNION ALL SELECT 'events', 'value_max_400', n_checked, r_max400 FROM e
      |  UNION ALL SELECT 'events', 'value_nonnegative', n_checked,
      |    r_nonneg FROM e)
      |ORDER BY tbl, rule""".stripMargin

  /** Row-level contract quarantine — p17 scores the FEED, this routes the
    * ROWS: every record is evaluated against the rule set map-side and
    * violators land in a quarantine frame carrying the names of ALL rules
    * they failed (the triage key: a spike of `value_above_400` is a unit
    * bug upstream, `error_event` is semantic filtering). The batch twin
    * of E9's deser-DLQ contract — bad rows are never dropped, they're
    * routed with a reason. Pure per-row codegen (conditions + concat_ws,
    * which skips nulls identically in both engines), no shuffle until the
    * output sort; the survivors' path is the same scan with the predicate
    * negated, so Catalyst shares the read. */
  private def p18(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("failed_rules", concat_ws(",",
        when(col("value") > 400, "value_above_400"),
        when(col("value") < 1, "value_below_1"),
        when(col("event_type") === "error", "error_event")))
      .withColumn("n_failed",
        (when(col("value") > 400, 1).otherwise(0)
          + when(col("value") < 1, 1).otherwise(0)
          + when(col("event_type") === "error", 1).otherwise(0))
          .cast("long"))
      .filter(col("n_failed") > 0L)
      .select(col("event_id"), col("failed_rules"), col("n_failed"))
      .orderBy(col("event_id"))

  private val p18Sql =
    """SELECT event_id,
      |  concat_ws(',',
      |    CASE WHEN value > 400 THEN 'value_above_400' END,
      |    CASE WHEN value < 1 THEN 'value_below_1' END,
      |    CASE WHEN event_type = 'error' THEN 'error_event' END)
      |    AS failed_rules,
      |  CAST((CASE WHEN value > 400 THEN 1 ELSE 0 END)
      |    + (CASE WHEN value < 1 THEN 1 ELSE 0 END)
      |    + (CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_failed
      |FROM events
      |WHERE value > 400 OR value < 1 OR event_type = 'error'
      |ORDER BY event_id""".stripMargin

  /** Context-length ablation report — the "pick max_seq_len" decision
    * table (p16 audits padding for the length-bucketed regime; this
    * audits TRUNCATION for the fixed-window regime): for each candidate
    * context length L ∈ {16, 32, 64, 128} (levels sized to this corpus's
    * 10-99-token docs; production levels are 512-8192), how many docs overflow,
    * what fraction of corpus tokens the window keeps (min(len, L) per
    * doc), and the kept share in permille — the curve whose knee picks
    * L. ONE corpus pass: every L-level is a conditional-aggregation leg
    * of the same hash aggregate (s14's sweep discipline — never one scan
    * per level), then 4 constant rows unpivot via stack. */
  private def p19(s: SparkSession, dir: String): DataFrame = {
    val lens = Seq(16L, 32L, 64L, 128L)
    val aggs = lens.flatMap { l =>
      Seq(
        sum(when(col("n_tokens") > l, 1L).otherwise(0L)).as(s"over_$l"),
        sum(least(col("n_tokens"), lit(l))).as(s"kept_$l"))
    }
    val stackExpr = lens
      .map(l => s"${l}L, over_$l, kept_$l")
      .mkString("stack(4, ", ", ", ") AS (max_len, docs_truncated, tokens_kept)")
    Tables(s, dir).documentsSpread
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_tokens")).as("total_tokens") +: aggs): _*)
      .selectExpr("n_docs", "total_tokens", stackExpr)
      .select(col("max_len"), col("n_docs"), col("docs_truncated"),
        col("tokens_kept"),
        expr("tokens_kept * 1000 div total_tokens").as("kept_permille"))
      .orderBy(col("max_len"))
  }

  private val p19Sql =
    s"""WITH d AS (
      |  SELECT ${QualityScore.duckNTokens} AS n_tokens
      |  FROM documents),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |    CAST(count(*) FILTER (WHERE n_tokens > 16) AS BIGINT) AS o16,
      |    CAST(sum(least(n_tokens, 16)) AS BIGINT) AS k16,
      |    CAST(count(*) FILTER (WHERE n_tokens > 32) AS BIGINT) AS o32,
      |    CAST(sum(least(n_tokens, 32)) AS BIGINT) AS k32,
      |    CAST(count(*) FILTER (WHERE n_tokens > 64) AS BIGINT) AS o64,
      |    CAST(sum(least(n_tokens, 64)) AS BIGINT) AS k64,
      |    CAST(count(*) FILTER (WHERE n_tokens > 128) AS BIGINT) AS o128,
      |    CAST(sum(least(n_tokens, 128)) AS BIGINT) AS k128
      |  FROM d)
      |SELECT v.max_len, m.n_docs, v.docs_truncated, v.tokens_kept,
      |  v.tokens_kept * 1000 // m.total_tokens AS kept_permille
      |FROM m, (
      |  SELECT CAST(16 AS BIGINT) AS max_len, o16 AS docs_truncated,
      |    k16 AS tokens_kept FROM m
      |  UNION ALL SELECT 32, o32, k32 FROM m
      |  UNION ALL SELECT 64, o64, k64 FROM m
      |  UNION ALL SELECT 128, o128, k128 FROM m) v
      |ORDER BY v.max_len""".stripMargin

  /** Shard-to-worker balancing (serpentine LPT) — the straggler control
    * for the training-data loader: p04's shards differ in token mass, and
    * naive round-robin by shard ID can load one worker with the heavy
    * tail (the slowest worker sets epoch wall-clock — the data-parallel
    * straggler problem). Serpentine longest-first (rank shards by size,
    * deal passes alternating direction: 0,1,2,3,3,2,1,0,…) is the
    * deterministic, relational form of LPT greedy — within ~one shard of
    * its balance in practice, with zero iterative state. Ranking uses a
    * broadcast self-join count over the |shards|-row frame (x15's
    * pattern — no global window; at 10⁶ shards switch to a two-level
    * bucket rank). Output: each shard's worker plus the worker's total
    * load and share — the table whose max/min spread IS the predicted
    * straggler margin. All integer. */
  private def p20(s: SparkSession, dir: String): DataFrame = {
    val nWorkers = 4
    val shards = Tables(s, dir).documentsSpread
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("shard", StableHash.h60(col("text")) % nShards)
      .groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
    val ranked = shards.as("a")
      .join(broadcast(shards.select(col("shard").as("b_shard"),
        col("shard_tokens").as("b_tokens"))),
        (col("b_tokens") > col("shard_tokens")) ||
          (col("b_tokens") === col("shard_tokens")
            && col("b_shard") < col("shard")),
        "left")
      .groupBy(col("shard"), col("shard_tokens"))
      .agg(count(col("b_shard")).as("size_rank"))
      .withColumn("pass", expr(s"size_rank div $nWorkers"))
      .withColumn("pos", expr(s"size_rank % $nWorkers"))
      .withColumn("worker",
        when(col("pass") % 2 === 0, col("pos"))
          .otherwise(lit(nWorkers - 1L) - col("pos")))
    val loads = ranked.groupBy(col("worker"))
      .agg(sum(col("shard_tokens")).as("worker_tokens"))
    val total = shards.agg(sum(col("shard_tokens")).as("total"))
    ranked.join(broadcast(loads), "worker")
      .crossJoin(broadcast(total))
      .select(col("shard"), col("size_rank"), col("worker"),
        col("shard_tokens"), col("worker_tokens"),
        expr("worker_tokens * 1000 div total").as("worker_share_permille"))
      .orderBy(col("shard"))
  }

  private val p20Sql =
    s"""WITH sh AS (
       |  SELECT (${StableHash.duckH60("text")}) % $nShards AS shard,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |      AS shard_tokens
       |  FROM documents
       |  GROUP BY 1),
       |agg AS (
       |  SELECT shard, CAST(sum(shard_tokens) AS BIGINT) AS shard_tokens
       |  FROM sh GROUP BY shard),
       |rk AS (
       |  SELECT a.shard, a.shard_tokens,
       |    (SELECT count(*) FROM agg b
       |     WHERE b.shard_tokens > a.shard_tokens
       |       OR (b.shard_tokens = a.shard_tokens AND b.shard < a.shard))
       |      AS size_rank
       |  FROM agg a),
       |asn AS (
       |  SELECT *, CASE WHEN (size_rank // 4) % 2 = 0 THEN size_rank % 4
       |    ELSE 3 - (size_rank % 4) END AS worker
       |  FROM rk),
       |loads AS (
       |  SELECT worker, CAST(sum(shard_tokens) AS BIGINT) AS worker_tokens
       |  FROM asn GROUP BY worker)
       |SELECT a.shard, CAST(a.size_rank AS BIGINT) AS size_rank,
       |  CAST(a.worker AS BIGINT) AS worker, a.shard_tokens,
       |  l.worker_tokens,
       |  CAST(l.worker_tokens * 1000
       |    // (SELECT sum(shard_tokens) FROM agg) AS BIGINT)
       |    AS worker_share_permille
       |FROM asn a JOIN loads l ON l.worker = a.worker
       |ORDER BY a.shard""".stripMargin

  /** Fully MAP-SIDE decontamination — p08's semantics with the exact
    * confirm stage also inside the per-document `exists()`: bloom
    * prefilter short-circuits the overwhelmingly-clean majority, and
    * [[graft.functions.ExactSetContains]]'s sorted-array binary search
    * (native codegen expression, 8 bytes/key) settles survivors — so
    * the contamination DECISION costs no explode, no shuffle, and no
    * join at all; the only exchange left is the output sort. This is
    * the best 100 TB shape whenever the probe set fits executor memory
    * as a primitive array (~10^7 keys = 80 MB); beyond that, p08's
    * explode + broadcast-confirm remains the fallback (the builder
    * throws past its cap rather than silently truncating). The oracle
    * runs the exact formulation, so a bloom false positive that leaked
    * through the confirm — or a binary-search bug that dropped a clean
    * document — breaks the hash match. */
  private def p21(s: SparkSession, dir: String): DataFrame = {
    // probe (doc_id < 20) and corpus (doc_id >= 20) are DISJOINT slices,
    // so nothing is shared between the build pass and the corpus scan —
    // no cache anywhere: the tiny probe slice is scanned once by
    // buildBoth (bloom fed driver-side from the same collected keys)
    // and the 100 TB corpus side STREAMS through the map-side predicate
    val base = ContaminationGrams.perDoc(Tables(s, dir).documentsSpread,
      keep = Seq("lang"))
    val probe = base.filter(col("doc_id") < 20)
      .select(explode(col("ghashes")).as("g"))
    val (probeExact, probeBloom) =
      graft.functions.ExactSetContains.buildBoth(probe)
    // plan_fence: without it predicate pushdown drags the gram-hash
    // recompute below documentsSpread's repartition onto the single
    // pre-shuffle scan task (the testdata file is one row group) —
    // measured 5.4 s vs ~0.5 s at sf0.1; on a multi-split cluster input
    // you would drop both the repartition and the fence
    base.filter(col("doc_id") >= 20)
      .filter(graft.functions.PlanFence.fence(!exists(col("ghashes"), g =>
        graft.functions.BloomContains.bloomContains(g, probeBloom)
          && graft.functions.ExactSetContains
            .sortedSetContains(g, probeExact))))
      .select(col("doc_id"), col("lang"),
        size(col("ghashes")).cast("long").as("n_grams"))
      .orderBy(col("doc_id"))
  }

  private val p21Sql =
    """WITH gr AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
      |      i -> concat(w[CAST(i AS INT)], ' ', w[CAST(i AS INT) + 1], ' ',
      |        w[CAST(i AS INT) + 2], ' ', w[CAST(i AS INT) + 3], ' ',
      |        w[CAST(i AS INT) + 4]))) AS gram
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
      |    WHERE len(w) >= 5) u),
      |probe AS (SELECT DISTINCT gram FROM gr WHERE doc_id < 20),
      |contaminated AS (
      |  SELECT DISTINCT doc_id FROM gr JOIN probe USING (gram)
      |  WHERE doc_id >= 20)
      |SELECT d.doc_id, d.lang,
      |  (SELECT CAST(count(DISTINCT gram) AS BIGINT) FROM gr
      |   WHERE gr.doc_id = d.doc_id) AS n_grams
      |FROM documents d
      |WHERE d.doc_id >= 20
      |  AND len(string_split(d.text, ' ')) >= 5
      |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      |ORDER BY d.doc_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "p01_training_corpus" -> QueryDef(p01, Some(p01Sql), headline = true),
    "p02_token_budget" -> QueryDef(p02, Some(p02Sql)),
    "p03_mixture_epochs" -> QueryDef(p03, Some(p03Sql)),
    "p04_shard_assign" -> QueryDef(p04, Some(p04Sql)),
    "p05_decontaminated_corpus" -> QueryDef(p05, Some(p05Sql)),
    "p06_source_cap" -> QueryDef(p06, Some(p06Sql)),
    "p07_mix_report" -> QueryDef(p07, Some(p07Sql)),
    "p08_bloom_decontaminate" -> QueryDef(p08, Some(p08Sql)),
    "p09_epoch_shuffle_order" -> QueryDef(p09, Some(p09Sql)),
    "p10_sequence_pack" -> QueryDef(p10, Some(p10Sql)),
    "p11_waterfill_budget" -> QueryDef(p11, Some(p11Sql)),
    "p12_dataset_card" -> QueryDef(p12, Some(p12Sql)),
    "p13_shard_manifest" -> QueryDef(p13, Some(p13Sql)),
    "p14_curriculum_order" -> QueryDef(p14, Some(p14Sql)),
    "p15_corpus_diff" -> QueryDef(p15, Some(p15Sql)),
    "p16_length_buckets" -> QueryDef(p16, Some(p16Sql)),
    "p17_contract_audit" -> QueryDef(p17, Some(p17Sql)),
    "p18_row_quarantine" -> QueryDef(p18, Some(p18Sql)),
    "p19_length_ablation" -> QueryDef(p19, Some(p19Sql)),
    "p20_shard_balance" -> QueryDef(p20, Some(p20Sql)),
    // round-8: fully map-side decontamination (bloom prefilter + exact
    // sorted-set confirm inside one exists() — no explode, no join)
    "p21_exact_set_decontaminate" -> QueryDef(p21, Some(p21Sql)),
  )
}
