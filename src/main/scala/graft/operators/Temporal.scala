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

  /** Forward as-of join — q31's mirror (pandas `merge_asof
    * direction='forward'`): for every `click`, the EARLIEST `purchase` by
    * the same user at-or-after it (conversion attribution forward in
    * time). Same no-join union-scan topology as q31, with the window
    * frame flipped to currentRow..unboundedFollowing and `first` instead
    * of `last`; tie rule mirrored (a purchase at exactly the click's
    * timestamp matches; among equal-ts purchases the LOWEST event_id
    * wins). One shuffle on user_id, zero pair blowup. */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    // DESCENDING time with a GROWING frame (unboundedPreceding..current):
    // Spark executes growing frames incrementally (O(n) per partition)
    // but shrinking ones (currentRow..unboundedFollowing) via the
    // quadratic UnboundedFollowingWindowFunctionFrame — re-aggregating
    // the remaining partition per row, exactly the hot-user blowup this
    // topology exists to avoid. Walking time backwards, `last` purchase
    // seen at-or-before the click in DESC order = earliest at-or-after in
    // real time. Equal-ts purchases sort before the click (inside its
    // frame); event_id DESC makes `last` pick the lowest id among
    // equal-ts purchases — the oracle's ORDER BY p.ts, p.event_id pick.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc,
        (col("event_type") === "purchase").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("purchase_id", last(
        when(col("event_type") === "purchase", col("event_id")),
        ignoreNulls = true).over(w))
      .withColumn("purchase_ts_us", last(
        when(col("event_type") === "purchase", col("ts_us")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "click" && col("purchase_id").isNotNull)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("purchase_id"),
        (col("purchase_ts_us") - col("ts_us")).as("gap_us"))
      .orderBy(col("click_id"))
  }

  private val q48Sql =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |pairs AS (
      |  SELECT c.event_id AS click_id, c.user_id AS user_id,
      |    p.event_id AS purchase_id,
      |    epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY p.ts, p.event_id) AS rk
      |  FROM c JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts)
      |SELECT click_id, user_id, purchase_id, gap_us FROM pairs
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

  /** Gaps-and-islands sessionization over an (user_id, ts_us, event_id)
    * frame: appends `new_sess` (30-min-default inactivity gap, ties at
    * equal ts ordered by event_id so every engine sees identical lag
    * chains) and the running `session_id`. SHARED by q43 (the batch
    * sessionizer) and a31 (session paths), whose docs require identical
    * session boundaries — one definition so the gap constant and tie
    * rule cannot fork. */
  private[operators] def sessionized(df: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(ord) <= gapUs, 0L)
          .otherwise(1L))
      .withColumn("session_id", sum(col("new_sess")).over(run))
  }

  /** Batch sessionization (gaps-and-islands): per-user sessions delimited by
    * a 30-minute inactivity gap — the batch twin of a03's streaming
    * `session_window` (backfills and reprocessing runs need the same
    * sessions from the batch path, and their outputs must agree).
    *
    * Scale design: two window passes partitioned by user_id — the gap flag
    * (`lag`) and the running session index (`sum`) — then one keyed
    * aggregate on (user, session). Everything after the single shuffle on
    * user_id is cluster-local; no self-join, no global sort. Ties at equal
    * ts are ordered by event_id so both engines see identical lag chains.
    * Money is summed as integer cents. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    sessionized(t(s, dir).events
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100, 0).cast("long").as("cents")))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q43Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
      |      (PARTITION BY user_id ORDER BY ts_us, event_id) <= 1800000000
      |    THEN 0 ELSE 1 END AS new_sess
      |  FROM e),
      |sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(ts_us) AS start_us, max(ts_us) AS end_us,
      |  max(ts_us) - min(ts_us) AS duration_us,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Max-concurrency sweep-line: each event occupies the half-open interval
    * [ts, ts + value seconds); per user, the peak number of simultaneously
    * open intervals (the classic "peak concurrent sessions / connections"
    * question, answered without any interval × interval overlap join).
    *
    * Scale design: each interval explodes to exactly two delta rows
    * (+1 open, −1 close); the running sum and max are windows partitioned
    * by user_id — one shuffle, per-user work cluster-local, O(n log n) in a
    * user's events. A pairwise `a.start < b.end AND b.start < a.end`
    * formulation would be quadratic per hot user. Interval ends are exact
    * integers (cents × 10^4 micros), so both engines sweep identical
    * boundaries; at equal boundary time closes sort before opens (half-open
    * semantics), then event_id for full determinism. */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val deltas = t(s, dir).events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts"))
          + round(col("value") * 100, 0).cast("long") * 10000L).as("end_us"))
      .select(col("event_id"), col("user_id"), explode(array(
        struct(col("start_us").as("t_us"), lit(1L).as("delta")),
        struct(col("end_us").as("t_us"), lit(-1L).as("delta")))).as("d"))
      .select(col("event_id"), col("user_id"),
        col("d.t_us").as("t_us"), col("d.delta").as("delta"))
    val sweep = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("open", sum(col("delta")).over(sweep))
      .groupBy(col("user_id"))
      .agg(max(col("open")).as("peak_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy(col("user_id"))
  }

  private val q44Sql =
    """WITH iv AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS start_us,
      |    epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 10000
      |      AS end_us
      |  FROM events),
      |deltas AS (
      |  SELECT event_id, user_id, start_us AS t_us, 1 AS delta FROM iv
      |  UNION ALL
      |  SELECT event_id, user_id, end_us AS t_us, -1 AS delta FROM iv),
      |swept AS (
      |  SELECT user_id, CAST(sum(delta) OVER (PARTITION BY user_id
      |    ORDER BY t_us, delta, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open
      |  FROM deltas)
      |SELECT user_id, max(open) AS peak_concurrent,
      |  CAST(count(*) / 2 AS BIGINT) AS n_intervals
      |FROM swept
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Large×large interval-overlap join, binned: every (view, click) pair by
    * the same user whose occupancy intervals [ts, ts + value min) overlap —
    * per-user pair counts and overlap mass (ad-attribution / co-occurrence
    * style questions where BOTH interval sets are fact-sized).
    *
    * Scale design: a plain `a.s < b.e AND b.s < a.e` join on user_id alone
    * degrades to per-user quadratic work for hot users (SortMergeJoin on
    * user, then the range predicate filters the cross product row by row).
    * Instead each interval explodes into the fixed-width time bins it
    * covers (`sequence(s div W, (e-1) div W)` — map-side, no shuffle) and
    * the join is a pure equi-join on (user_id, bin): candidates are bounded
    * by per-bin occupancy, never per-user event count. Each overlapping
    * pair shares every bin covering its overlap, so it is emitted exactly
    * once at its FIRST common bin — the bin containing `greatest(a.s, b.s)`
    * (that instant lies inside both half-open intervals) — a join-side
    * predicate, so no post-join dedup shuffle exists. W trades explode
    * factor against bin occupancy; 1 h covers these minute-scale
    * intervals with ≤ ~10 bins each (at 100 TB, set W ≈ median interval
    * length). Interval ends are exact integers (cents × 6·10^5 micros =
    * value minutes) and value=0 rows (empty intervals) are dropped on
    * both engines. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val W = 3600000000L // 1 h bins, in micros
    def iv(tpe: String, p: String) = t(s, dir).events
      .filter(col("event_type") === tpe)
      .select(col("event_id").as(s"${p}_id"),
        col("user_id").as(s"${p}_user"),
        unix_micros(col("ts")).as(s"${p}_s"),
        (unix_micros(col("ts"))
          + round(col("value") * 100, 0).cast("long") * 600000L).as(s"${p}_e"))
      .filter(col(s"${p}_e") > col(s"${p}_s"))
      .withColumn(s"${p}_bin",
        explode(sequence(expr(s"${p}_s div $W"), expr(s"(${p}_e - 1) div $W"))))
    val a = iv("view", "a")
    val b = iv("click", "b")
    a.join(b,
        col("a_user") === col("b_user") && col("a_bin") === col("b_bin") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
        col("a_bin") === expr(s"greatest(a_s, b_s) div $W"))
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("a_e"), col("b_e"))
          - greatest(col("a_s"), col("b_s"))).as("sum_overlap_us"),
        max(least(col("a_e"), col("b_e"))
          - greatest(col("a_s"), col("b_s"))).as("max_overlap_us"))
      .orderBy(col("user_id"))
  }

  private val q50Sql =
    """WITH iv AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 600000 AS e
      |  FROM events),
      |a AS (SELECT * FROM iv WHERE event_type = 'view' AND e > s),
      |b AS (SELECT * FROM iv WHERE event_type = 'click' AND e > s)
      |SELECT a.user_id AS user_id,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
      |    AS sum_overlap_us,
      |  CAST(max(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
      |    AS max_overlap_us
      |FROM a JOIN b ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
      |GROUP BY a.user_id
      |ORDER BY user_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q31_asof_join" -> QueryDef(q31, Some(q31Sql), headline = true),
    "q32_range_join" -> QueryDef(q32, Some(q32Sql)),
    "q33_range_frame" -> QueryDef(q33, Some(q33Sql)),
    "q43_sessionize" -> QueryDef(q43, Some(q43Sql)),
    "q44_interval_concurrency" -> QueryDef(q44, Some(q44Sql)),
    "q48_asof_forward" -> QueryDef(q48, Some(q48Sql)),
    "q50_interval_join" -> QueryDef(q50, Some(q50Sql), headline = true),
  )
}
