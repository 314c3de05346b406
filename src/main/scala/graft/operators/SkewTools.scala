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
}
