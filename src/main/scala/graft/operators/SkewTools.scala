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
  * reducers instead of one.
  */
object SkewTools {

  /** Salted equi-join: the (small) right side is replicated saltFactor ways,
    * the (large, skewed) left side gets a deterministic salt from its row
    * content; joining on (key, salt) spreads each hot key. Use when one side
    * is small-ish but too big to broadcast and the key histogram is heavy-
    * tailed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor)).cast("int"))
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
      saltFactor: Int): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
          lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))

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
    freqs(left, leftArr, "fl").join(freqs(right, rightArr, "fr"), "e")
      .select(col("e"), (col("fl") * col("fr")).as("contrib"))
      .agg(
        count(lit(1)).as("n_common_elements"),
        sum(col("contrib")).as("est_candidate_rows"),
        max(col("contrib")).as("max_element_rows"),
        max_by(col("e"), struct(col("contrib"), col("e")))
          .as("worst_element"))
      // decimal(38) for the ×10000: contrib = fL·fR can reach ~1e18 at
      // the 100 TB scale this tool prices, so Long×10000 would wrap
      // negative and the diagnosis would silently read 'ok' exactly when
      // it matters; decimal keeps the share exact (IntegralDivide on
      // decimal returns BIGINT)
      .withColumn("max_share_bp",
        expr("cast(max_element_rows as decimal(38,0)) * 10000" +
          " div est_candidate_rows"))
      .withColumn("diagnosis",
        when(col("max_share_bp") >= warnShareBp,
          lit("hot-element: cap its frequency upstream (d02's " +
            "maxShingleFreq) or salt it before the overlap join"))
          .otherwise(lit("ok")))
  }
}
