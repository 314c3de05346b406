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
    * each row's ascending-sorted (size − c + 1)-element prefix
    * ([[graft.plans.RewriteSupport.prefixElems]]), so the preflight
    * counts frequencies over exactly those prefixes — the default c = 1
    * reproduces the full-explode estimate (and d31's oracle). */
  /** `floor(10000 · max_dec / est_dec)` over decimal(38,0) columns of
    * those names, with max_dec ≤ est_dec — exact integer arithmetic
    * while est_dec ≤ Long.Max (the product then ≤ 9.2e22 ≪ 1e38; every
    * test SF and any DuckDB-oracle run lands here), a truncated double
    * ratio past that: a decimal ×10000 above ~1e34 would overflow 38
    * digits to NULL and `when(NULL >= bound)` would flip the diagnosis
    * to 'ok' at exactly the hottest extreme. The share is a ≤10000
    * report value, so the double path's ~1e-15 relative error is
    * immaterial. */
  private[operators] def shareBp: Column =
    when(col("est_dec") <= lit(Long.MaxValue).cast("decimal(38,0)"),
      expr("max_dec * 10000 div est_dec"))
      .otherwise(expr("cast(floor(cast(max_dec as double) " +
        "/ cast(est_dec as double) * 10000.0) as bigint)"))

  def overlapJoinPreflight(left: DataFrame, leftArr: Column,
      right: DataFrame, rightArr: Column,
      warnShareBp: Long = 1000L, minOverlap: Int = 1): DataFrame = {
    def prefix(arr: Column): Column = {
      val d = array_distinct(filter(arr, e => e.isNotNull))
      if (minOverlap <= 1) d
      else {
        val s = sort_array(d)
        slice(s, lit(1), greatest(size(s) - lit(minOverlap - 1), lit(0)))
      }
    }
    def freqs(df: DataFrame, arr: Column, name: String) =
      df.select(explode(prefix(arr)).as("e"))
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
    freqs(left, leftArr, "fl").join(freqs(right, rightArr, "fr"), "e")
      .select(col("e"),
        (col("fl").cast("decimal(38,0)") * col("fr")).as("contrib"))
      .agg(
        count(lit(1)).as("n_common_elements"),
        sum(col("contrib")).as("est_dec"),
        max(col("contrib")).as("max_dec"),
        max_by(col("e"), struct(col("contrib"), col("e")))
          .as("worst_element"))
      // IntegralDivide on decimals returns BIGINT; the share is ≤ 10000
      .withColumn("max_share_bp", shareBp)
      .withColumn("diagnosis",
        when(col("max_share_bp") >= warnShareBp,
          lit("hot-element: cap its frequency upstream (d02's " +
            "maxShingleFreq) or salt it before the overlap join"))
          .otherwise(lit("ok")))
      .select(col("n_common_elements"),
        expr("try_cast(est_dec as bigint)").as("est_candidate_rows"),
        expr("try_cast(max_dec as bigint)").as("max_element_rows"),
        col("worst_element"), col("max_share_bp"), col("diagnosis"))
  }
}
