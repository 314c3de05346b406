package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the manual levers behind SURVEY §4.2's
  * "salting for skew"; AQE's skew-join split is the automatic one and is
  * enabled by [[graft.GraftSession]]).
  *
  * Salting is semantically transparent: both helpers produce exactly the
  * rows of their unsalted equivalents — only the shuffle key cardinality
  * changes (×saltFactor), so a hot key's rows spread over saltFactor
  * reducers instead of one. The salt is POSITIONAL
  * (monotonically_increasing_id mod saltFactor), not content-derived: a
  * content hash cannot spread BYTE-IDENTICAL rows — mirrored boilerplate,
  * templated spam, exactly the hot keys these corpora produce — since
  * every copy hashes to the same salt; position spreads unconditionally.
  * The salt never reaches the output (dropped before the final shape), so
  * positional nondeterminism cannot leak into results. */
object SkewTools {

  /** Salted equi-join: the (small) right side is replicated saltFactor ways,
    * the (large, skewed) left side gets a positional salt; joining on
    * (key, salt) spreads each hot key. Use when one side is small-ish but
    * too big to broadcast and the key histogram is heavy-tailed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    // fail fast: saltFactor 0 would salt the big side NULL (pmod by 0)
    // while sequence(0, -1) STILL replicates the small side (Spark's
    // sequence auto-steps downward) — an inner join that silently
    // returns nothing
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted two-phase aggregation: partial sum/count per (key, salt), final
    * recombine per key. Spark's hash aggregate already does map-side partial
    * aggregation, which usually makes salting unnecessary for aggregates —
    * this is for the residual case where a single reducer key still
    * dominates (e.g. high-cardinality partials under memory pressure). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong))
          .cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))
  }

  /** Hot-element pre-flight for the overlap-rewrite family — q52's
    * cardinality audit transposed to set-overlap joins: the exploded
    * candidate volume of [[graft.plans.SetOverlapJoinRewrite]]'s
    * pair-probe is EXACTLY Σ_e fL(e)·fR(e) over per-side distinct-
    * element document frequencies, so two keyed count aggregates plus a
    * count-table join (rows = distinct elements, never documents) price
    * the rewrite before it runs. d02 caps hot shingles by hand
    * (`maxShingleFreq`); naive rewritten queries have no such cap, and a
    * stop-word element (f_L·f_R ≈ |L|·|R|) turns the pair-probe back
    * into a near-cartesian — this report makes that a DIAGNOSED warning
    * (worst element named = the cap/salt target) instead of a mystery
    * straggler task. One row: common-element count, exact candidate-row
    * total, the worst element's contribution/share (integer basis
    * points), and a diagnosis string; `warnShareBp` sets the warning
    * threshold (default 10%). Nulls are dropped per arrays_overlap's
    * non-null-witness contract, mirroring the rewrite.
    *
    * `minOverlap` prices the threshold spellings: for
    * `size(array_intersect) >= c` with c ≥ 2 the rewrite explodes only
    * each row's (size − c + 1)-element prefix in the SAME total order
    * [[graft.plans.RewriteSupport.hashedPrefixElems]] slices — natural
    * ascending for cheap-compare element types, (xxhash64, element) for
    * string/binary — so the preflight counts frequencies over exactly
    * those prefixes; the default c = 1 reproduces the full-explode
    * estimate (and d31's oracle). */
  /** `floor(10000 · max_dec / est_dec)` over decimal(38,0) columns of
    * those names, with max_dec ≤ est_dec — exact integer arithmetic
    * while est_dec ≤ Long.Max (the product then ≤ 9.2e22 ≪ 1e38; every
    * test SF and any DuckDB-oracle run lands here), a truncated double
    * ratio past that: a decimal ×10000 above ~1e34 would overflow 38
    * digits to NULL and `when(NULL >= bound)` would flip the diagnosis
    * to 'ok' at exactly the hottest extreme. The share is a ≤10000
    * report value, so the double path's ~1e-15 relative error is
    * immaterial. */
  private[operators] def shareBp: Column = shareBpOf("max_dec")

  /** The ONE copy of the sampled-estimator plumbing both preflights
    * share (the first cut duplicated it verbatim — a future seed or
    * validation fix applied to one family would silently diverge the
    * other): per-side Bernoulli samples with DISTINCT fixed seeds (a
    * self-join sampling identical rows on both sides would bias
    * E[fl·fr] upward by the diagonal f(1−f)·F term; independent draws
    * keep it unbiased at f²·fL·fR), 1/f² output scaling in double (the
    * sample already injected binomial noise far above double rounding,
    * so the exact path's decimal discipline buys nothing here), and
    * the provenance column appended only when sampling. */
  private final class SampledAudit(f: Double) {
    private val sampled = f > 0.0 && f < 1.0
    private val inv2 = if (sampled) 1.0 / (f * f) else 1.0
    def left(df: DataFrame): DataFrame =
      if (sampled) df.sample(withReplacement = false, f, 42L) else df
    def right(df: DataFrame): DataFrame =
      if (sampled) df.sample(withReplacement = false, f, 211L) else df
    /** BIGINT report column: an EMPTY aggregate's NULL means "zero
      * observed candidates" and must read 0 — under sampling a small
      * side routinely draws no rows at all, and letting that NULL ride
      * into the report made logPreflight's boxed reader render it
      * '>Long.Max' (the string reserved for genuine BIGINT overflow),
      * reporting a tiny join as catastrophically hot. Only a non-null
      * value that try_cast degrades (true overflow) stays NULL. */
    def bigOut(name: String): Column =
      when(col(name).isNull, lit(0L)).otherwise(
        if (!sampled) expr(s"try_cast($name as bigint)")
        else expr(s"try_cast(cast($name as double) * $inv2 as bigint)"))
    def withProvenance(df: DataFrame): DataFrame =
      if (!sampled) df else df.withColumn("sample_fraction", lit(f))
  }

  /** Same contract for any numerator column ≤ `est_dec` (the
    * empty-empty share reuses it with `ee_dec`). */
  private[operators] def shareBpOf(num: String): Column =
    when(col("est_dec") <= lit(Long.MaxValue).cast("decimal(38,0)"),
      expr(s"$num * 10000 div est_dec"))
      .otherwise(expr(s"cast(floor(cast($num as double) " +
        "/ cast(est_dec as double) * 10000.0) as bigint)"))

  /** `includeEmptyEmpty` prices the `>=`-Jaccard spelling's second
    * branch: 0 ≥ τ·0 holds for every τ, so EVERY empty-array ×
    * empty-array pair is REQUIRED output of
    * [[graft.plans.SetOverlapJoinRewrite.withEmptyEmptyBranch]] — a
    * quadratic volume no witnessed-element count can see (empty arrays
    * explode zero elements). Two one-row count aggregates
    * (`size(arr) = 0` per side, the branch's own emptiness filter)
    * price it exactly: the report gains `empty_empty_rows` +
    * `empty_share_bp` columns, the volume joins the candidate
    * estimate, and a dominant share gets its own diagnosis (the fix is
    * different — filter empty arrays upstream or use the strict `>`
    * spelling, not capping an element). Default off: the two extra
    * columns would break consumers pinned to the witnessed-only schema
    * (d31's oracle), and the strict spellings have no such branch. */
  /** `sampleFraction` < 1 makes the audit AFFORDABLE at 100 TB: the
    * exact audit is a full scan + explode of both join children, which
    * is unpayable at planning time exactly where the circuit breaker
    * matters most. Each side is Bernoulli-sampled at the given rate
    * (fixed, DISTINCT seeds per side — a self-join sampling identical
    * rows on both sides would bias E[fl·fr] upward by the diagonal
    * f(1−f)·F term; independent draws keep it unbiased at f²·fL·fR),
    * frequencies are counted over the sample, and the ABSOLUTE row
    * estimates (`est_candidate_rows`, `max_element_rows`,
    * `empty_empty_rows`) are scaled back by 1/f². The SHARES and the
    * diagnosis need no scaling at all — every contribution carries the
    * same f² factor, so ratios are scale-invariant: a hot element
    * dominating the full data dominates the sample. The report then
    * carries a `sample_fraction` provenance column (appended ONLY when
    * sampling, so the exact path's schema — d31's oracle — is
    * unchanged), and `n_common_elements` counts elements OBSERVED in
    * the sample (an undercount; an element rarer than ~1/f per side is
    * invisible — which also bounds the miss: too rare to sample is too
    * rare to dominate). Values outside (0, 1) mean exact. */
  def overlapJoinPreflight(left: DataFrame, leftArr: Column,
      right: DataFrame, rightArr: Column,
      warnShareBp: Long = 1000L, minOverlap: Int = 1,
      includeEmptyEmpty: Boolean = false,
      sampleFraction: Double = 1.0): DataFrame = {
    val audit = new SampledAudit(sampleFraction)
    val (leftS, rightS) = (audit.left(left), audit.right(right))
    import audit.{bigOut, withProvenance}
    // the sliced order must MIRROR what the rewrite actually explodes
    // (RewriteSupport.hashedPrefixElems, round 10): string/binary
    // elements sort by (xxhash64(e), e) — functions.xxhash64 uses the
    // same fixed seed 42 — and cheap-compare types by natural order. A
    // preflight slicing a different order than the join prices the
    // WRONG explode in both directions, and under preflight=fail that
    // stale estimate becomes a wrong abort/proceed decision. The report
    // still carries RAW elements (worst_element must name something the
    // user can cap or salt).
    def prefix(df: DataFrame, arr: Column): Column = {
      val d = array_distinct(filter(arr, e => e.isNotNull))
      if (minOverlap <= 1) d
      else {
        val et = df.select(arr.as("_graft_arr")).schema.head.dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        val s = et match {
          case org.apache.spark.sql.types.StringType
              | org.apache.spark.sql.types.BinaryType =>
            val tagged = transform(d,
              e => struct(xxhash64(e).as("h"), e.as("v")))
            transform(sort_array(tagged), x => x.getField("v"))
          case _ => sort_array(d)
        }
        slice(s, lit(1), greatest(size(d) - lit(minOverlap - 1), lit(0)))
      }
    }
    def freqs(df: DataFrame, arr: Column, name: String) =
      df.select(explode(prefix(df, arr)).as("e"))
        .groupBy(col("e")).agg(count(lit(1)).as(name))
    // decimal(38) from the FIRST multiply: contrib = fL·fR alone can
    // pass Long.Max at the 100 TB scale this tool prices (fL = fR = 4e9
    // → 1.6e19), where Long arithmetic would throw under ANSI or wrap
    // negative and silently read 'ok' under legacy — exactly when the
    // diagnosis matters. contrib, sum, and max stay exact in decimal to
    // 1e38; the ×10000 share is exact while est_dec ≤ Long.Max (max_dec
    // ≤ est_dec, so the product ≤ 9.2e22 ≪ 1e38 — every test SF and any
    // oracle run lands here) and degrades to a truncated double ratio
    // past that (a decimal ×10000 above ~1e34 would overflow 38 digits
    // to NULL and flip the diagnosis to 'ok' at the hottest extreme);
    // the BIGINT report columns degrade to NULL via try_cast past
    // 9.2e18 (the diagnosis string survives).
    val witnessed = freqs(leftS, leftArr, "fl")
      .join(freqs(rightS, rightArr, "fr"), "e")
      .select(col("e"),
        (col("fl").cast("decimal(38,0)") * col("fr")).as("contrib"))
      .agg(
        count(lit(1)).as("n_common_elements"),
        sum(col("contrib")).as("wit_dec"),
        max(col("contrib")).as("max_dec"),
        max_by(col("e"), struct(col("contrib"), col("e")))
          .as("worst_element"))
    val hotElementDiag =
      lit("hot-element: cap its frequency upstream (d02's " +
        "maxShingleFreq) or salt it before the overlap join")
    if (!includeEmptyEmpty)
      withProvenance(witnessed
        .withColumn("est_dec", col("wit_dec"))
        // IntegralDivide on decimals returns BIGINT; the share is ≤ 10000
        .withColumn("max_share_bp", shareBp)
        .withColumn("diagnosis",
          when(col("max_share_bp") >= warnShareBp, hotElementDiag)
            .otherwise(lit("ok")))
        .select(col("n_common_elements"),
          bigOut("est_dec").as("est_candidate_rows"),
          bigOut("max_dec").as("max_element_rows"),
          col("worst_element"), col("max_share_bp"), col("diagnosis")))
    else {
      // |E_l|·|E_r| — the >=-Jaccard empty-empty branch's exact output
      // size; size(arr) = 0 mirrors the branch's emptiness filter (a
      // NULL array sizes NULL, never 0 — it joins to nothing there too)
      def emptyCount(df: DataFrame, arr: Column, name: String) =
        df.filter(size(arr) === lit(0))
          .agg(count(lit(1)).cast("decimal(38,0)").as(name))
      val ee = emptyCount(leftS, leftArr, "el")
        .crossJoin(emptyCount(rightS, rightArr, "er"))
        .select((col("el") * col("er")).as("ee_dec"))
      withProvenance(witnessed.crossJoin(ee)
        // wit_dec is NULL when the sides share no elements at all — the
        // empty-empty volume still exists then (coalesce, don't null out)
        .withColumn("est_dec",
          coalesce(col("wit_dec"), lit(0).cast("decimal(38,0)"))
            + col("ee_dec"))
        // est_dec is exactly 0 when there are no common elements AND no
        // empties — unlike the witnessed-only path (where an empty agg
        // leaves est_dec NULL and the shares ride NULL through), the
        // coalesce makes a literal zero divisor: guard both shares
        .withColumn("max_share_bp",
          when(col("est_dec") === 0, lit(0L)).otherwise(shareBp))
        .withColumn("ee_share_bp",
          when(col("est_dec") === 0, lit(0L)).otherwise(shareBpOf("ee_dec")))
        .withColumn("diagnosis",
          when(col("ee_share_bp") >= warnShareBp,
            lit("empty-empty: the >= spelling emits every empty x empty " +
              "array pair — filter empty arrays upstream or use the " +
              "strict > spelling"))
            .when(col("max_share_bp") >= warnShareBp, hotElementDiag)
            .otherwise(lit("ok")))
        .select(col("n_common_elements"),
          bigOut("est_dec").as("est_candidate_rows"),
          bigOut("ee_dec").as("empty_empty_rows"),
          bigOut("max_dec").as("max_element_rows"),
          col("worst_element"), col("max_share_bp"),
          col("ee_share_bp").as("empty_share_bp"), col("diagnosis")))
    }
  }

  /** Hot-BLOCK pre-flight for the Hamming-rewrite family — d31's audit
    * transposed to [[graft.plans.HammingBlockJoinRewrite]]: the block
    * equi-join keys on (block-index, block-value) over the k+1-way
    * pigeonhole split of each 64-bit fingerprint
    * ([[graft.plans.HammingBlockJoinRewrite.layout]] — the SAME layout,
    * so this prices the join that actually runs), and its exploded
    * candidate volume is EXACTLY Σ_{(i,v)} fL(i,v)·fR(i,v) over per-side
    * (index, value) frequencies. A skewed block value — a zero-heavy
    * simhash block from near-empty documents is the canonical case —
    * blows up the equi-join the same way a stop-word element blows up
    * the overlap join; this names the worst (index, value) pair so the
    * fix (drop degenerate fingerprints upstream, or salt that block's
    * join keys) targets the right rows. Cost: two keyed counts (rows =
    * distinct (index, value) pairs, at most 2^width per index) plus a
    * count-table join — a fraction of the join it prices. Null
    * fingerprints are dropped: `hamming64` null-propagates, so a null
    * code never matches anything. Same report contract as the overlap
    * preflight: decimal(38,0)-exact candidate totals, share in integer
    * basis points, BIGINT columns try_cast-degraded past Long.Max,
    * `warnShareBp` the warning threshold (default 10%). */
  /** `sampleFraction`: same estimator contract as
    * [[overlapJoinPreflight]] — Bernoulli per-side samples (distinct
    * fixed seeds), absolute estimates scaled by 1/f², shares and
    * diagnosis scale-invariant, `sample_fraction` provenance column
    * appended only when sampling (d41's oracle pins the exact schema).
    * Values outside (0, 1) mean exact. */
  def hammingJoinPreflight(left: DataFrame, leftFp: Column,
      right: DataFrame, rightFp: Column, k: Int,
      warnShareBp: Long = 1000L,
      sampleFraction: Double = 1.0): DataFrame = {
    require(k >= 0 && k <= 15,
      s"k must be in [0, 15] (the rewrite's own firing bound), got $k")
    val audit = new SampledAudit(sampleFraction)
    val (leftS, rightS) = (audit.left(left), audit.right(right))
    import audit.{bigOut, withProvenance}
    val (n, widths, offsets) = graft.plans.HammingBlockJoinRewrite.layout(k)
    def blockCol(fp: Column, i: Int): Column = {
      val shifted =
        if (offsets(i) == 0) fp else shiftrightunsigned(fp, offsets(i))
      if (widths(i) >= 64) shifted
      else shifted.bitwiseAND(lit((1L << widths(i)) - 1L))
    }
    def freqs(df: DataFrame, fp: Column, name: String) =
      df.filter(fp.isNotNull)
        .select(posexplode(array((0 until n).map(i =>
          blockCol(fp, i)): _*)).as(Seq("bi", "bv")))
        .groupBy(col("bi"), col("bv")).agg(count(lit(1)).as(name))
    withProvenance(freqs(leftS, leftFp, "fl")
      .join(freqs(rightS, rightFp, "fr"), Seq("bi", "bv"))
      .select(col("bi"), col("bv"),
        (col("fl").cast("decimal(38,0)") * col("fr")).as("contrib"))
      .agg(
        count(lit(1)).as("n_common_blocks"),
        sum(col("contrib")).as("est_dec"),
        max(col("contrib")).as("max_dec"),
        max_by(col("bi"), struct(col("contrib"), col("bi"), col("bv")))
          .as("worst_bi"),
        max_by(col("bv"), struct(col("contrib"), col("bi"), col("bv")))
          .as("worst_bv"))
      .withColumn("max_share_bp", shareBp)
      .withColumn("diagnosis",
        when(col("max_share_bp") >= warnShareBp,
          lit("hot-block: a skewed block value dominates the equi-join " +
            "— drop degenerate fingerprints upstream or salt the hot " +
            "(index, value) key"))
          .otherwise(lit("ok")))
      .select(col("n_common_blocks"),
        bigOut("est_dec").as("est_candidate_rows"),
        bigOut("max_dec").as("max_block_rows"),
        col("worst_bi").cast("long").as("worst_block_index"),
        col("worst_bv").as("worst_block_value"),
        col("max_share_bp"), col("diagnosis")))
  }
}
