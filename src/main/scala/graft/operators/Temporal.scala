package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join/window operators beyond the reference's single windowed
  * stream-join family (`streams.clj:149-158`): as-of join, range join, and
  * time-range window frames — the event-time toolbox a 100 TB pipeline needs
  * for attribution, banding, and trailing aggregates.
  */
object Temporal {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** As-of join: for every `click` event, the most recent `view` by the same
    * user at-or-before its timestamp (attribution lookup).
    *
    * Scale design: NOT a join at all. A pairwise `c ⋈ v ON user AND v.ts <=
    * c.ts` + keep-latest explodes to |views-before| rows per click (quadratic
    * per hot user). Instead both event sets are unioned and scanned once per
    * user in timestamp order, carrying the last seen view via
    * `last(_, ignoreNulls)` — one shuffle on user_id, O(n log n) for the
    * sort, no intermediate blowup. This is the canonical distributed as-of
    * topology (same shape as Flink's temporal join state scan).
    * Tie rule: a view at exactly the click's timestamp matches (sort places
    * views before clicks at equal ts); among equal-ts views the highest
    * event_id wins — mirrored in the oracle's `ORDER BY v.ts DESC,
    * v.event_id DESC` pick. */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_type") =!= "view", col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("view_id", last(
        when(col("event_type") === "view", col("event_id")),
        ignoreNulls = true).over(w))
      .withColumn("view_ts_us", last(
        when(col("event_type") === "view", col("ts_us")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "click" && col("view_id").isNotNull)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("view_id"), (col("ts_us") - col("view_ts_us")).as("gap_us"))
      .orderBy(col("click_id"))
  }

  private val q31Sql =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |v AS (SELECT * FROM events WHERE event_type = 'view'),
      |pairs AS (
      |  SELECT c.event_id AS click_id, c.user_id AS user_id,
      |    v.event_id AS view_id, epoch_us(c.ts) - epoch_us(v.ts) AS gap_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY v.ts DESC, v.event_id DESC) AS rk
      |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts)
      |SELECT click_id, user_id, view_id, gap_us FROM pairs
      |WHERE rk = 1
      |ORDER BY click_id""".stripMargin

  /** Range join: events banded by `value` against an inline band-boundary
    * dimension via a non-equi predicate. The band table broadcasts
    * (BroadcastNestedLoopJoin) — the right physical plan for a tiny
    * boundary-dimension at any fact size; for uniform bands the same result
    * comes shuffle-free from a width-bucket expression (documented
    * alternative, kept as the general non-uniform-band operator here).
    * Money sums carried as integer cents (`round(value*100)`) so both
    * engines agree bit-for-bit regardless of summation order. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val bands = Seq(
      (0L, 0.0, 5.0), (1L, 5.0, 10.0), (2L, 10.0, 15.0),
      (3L, 15.0, 20.0), (4L, 20.0, 1e18))
      .toDF("band_id", "lo", "hi")
    t(s, dir).events
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
        round(min(col("value")), 2).as("min_v"),
        round(max(col("value")), 2).as("max_v"))
      .orderBy(col("band_id"))
  }

  private val q32Sql =
    """SELECT CAST(band_id AS BIGINT) AS band_id,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  round(min(value), 2) AS min_v,
      |  round(max(value), 2) AS max_v
      |FROM (VALUES (0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0),
      |  (3, 15.0, 20.0), (4, 20.0, 1e18)) bands(band_id, lo, hi)
      |JOIN events ON value >= lo AND value < hi
      |GROUP BY band_id
      |ORDER BY band_id""".stripMargin

  /** Time-range window frame: per-user trailing-10-minute event count and
    * value sum — `RANGE BETWEEN INTERVAL ... PRECEDING` expressed as a
    * micros-valued rangeBetween. One shuffle on user_id; the frame is
    * evaluated streaming per partition (no per-row re-join as a self-join
    * formulation would do). Integer-cents sum for cross-engine exactness. */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-600000000L, 0L)
    t(s, dir).events
      .filter(col("user_id") < 20)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("cents")).over(w).as("sum_cents_10m"))
      .orderBy(col("event_id"))
  }

  private val q33Sql =
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_10m,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
      |    AS sum_cents_10m
      |FROM events
      |WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q31_asof_join" -> QueryDef(q31, Some(q31Sql), headline = true),
    "q32_range_join" -> QueryDef(q32, Some(q32Sql)),
    "q33_range_frame" -> QueryDef(q33, Some(q33Sql)),
  )
}
