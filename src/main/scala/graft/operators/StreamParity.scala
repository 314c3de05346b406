package graft.operators

import graft.{QueryDef, Tables}
import graft.streaming.Middleware
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational (oracle-checkable) expressions of the reference's actual
  * operator surface — SURVEY.md §2.3/2.5/2.7: the too-old filter, the kafka
  * delay metric, JSON middleware, result-code dispatch, the retry-count state
  * machine, linear/exponential backoff, windowed stream-stream joins, and
  * batch poll chunking. The live streaming versions (readStream + watermarks
  * + foreachBatch) are in graft.streaming; these batch twins give the driver
  * a DuckDB hash-check of identical semantics over `events`.
  */
object StreamParity {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** R2 `TimestampTransformer` too-old filter (reference
    * timestamp_transformer.clj:21-30; cutoff streams.clj:26): drop records
    * older than `oldest-processed-message-in-s` (7 days) — anchored to
    * max(ts) instead of wall clock for determinism. The anchor is a 1-row
    * broadcast, so the filter stays a map-side operation at any scale. */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_recent"))
      .orderBy(col("event_type"))
  }

  private val q20Sql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_recent
      |FROM events
      |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** R2's kafka-delay histogram (kafka_delay.clj:5-13): distribution of
    * (now − record ts) bucketed by whole days, anchored to max(ts). */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .withColumn("delay_days",
        expr("(unix_micros(max_ts) - unix_micros(ts)) div 86400000000"))
      .groupBy(col("delay_days"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("delay_days"))
  }

  private val q21Sql =
    """SELECT (epoch_us((SELECT max(ts) FROM events)) - epoch_us(ts)) // 86400000000
      |    AS delay_days,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY delay_days""".stripMargin

  /** M3 JSON middleware (middleware/json.clj:12-50): parse the `props` JSON
    * payload, project a typed field, aggregate. from_json/get_json_object is
    * codegen'd — at scale this replaces the reference's per-message
    * cheshire parse with a vectorized column op. */
  private def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val q22Sql =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** E1 `mapper-func` result-code dispatch (mapper.clj:28-69): route each
    * record to success/skip/retry/dead-letter by a deterministic rule and
    * count per disposition — the relational twin of the foreachBatch
    * dispatcher in graft.streaming.Dispatch. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("disposition",
        when(col("event_type") === "error",
          when(col("value") < 0.5, "retry").otherwise("dead_letter"))
          .otherwise(when(col("value") < 0.1, "skip").otherwise("success")))
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("disposition"))

  private val q23Sql =
    """SELECT CASE WHEN event_type = 'error'
      |    THEN (CASE WHEN value < 0.5 THEN 'retry' ELSE 'dead_letter' END)
      |    ELSE (CASE WHEN value < 0.1 THEN 'skip' ELSE 'success' END) END
      |    AS disposition,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY disposition""".stripMargin

  /** E3 retry-count state machine (messaging/producer.clj:288-293):
    * remaining = event_id % 4 as the synthetic current count;
    * 0 → dead-letter, n → n−1. */
  private def q24(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .withColumn("remaining", col("event_id") % 4)
      .withColumn("next_state",
        when(col("remaining") === 0, "dead_letter")
          .otherwise((col("remaining") - 1).cast("string")))
      .groupBy(col("next_state"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("next_state"))

  private val q24Sql =
    """SELECT CASE WHEN event_id % 4 = 0 THEN 'dead_letter'
      |    ELSE CAST(event_id % 4 - 1 AS VARCHAR) END AS next_state,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY next_state""".stripMargin

  /** E4/E5 backoff schedule (messaging/producer.clj:175-224): for attempt
    * n = 1..25 (driven from nation, 25 rows), linear TTL = 5000 ms and
    * exponential TTL = (2^n − 1) × 5000 ms, exponent capped at
    * MAX_EXPONENTIAL_RETRIES = 25 (producer.clj:20). */
  private def q25(s: SparkSession, dir: String): DataFrame =
    t(s, dir).nation
      .select((col("n_nationkey") + 1).cast("long").as("attempt"))
      .withColumn("linear_ms", lit(5000L))
      .withColumn("exp_ms",
        ((pow(lit(2.0), least(col("attempt"), lit(25L)).cast("double")) - 1.0)
          * 5000.0).cast("long"))
      .orderBy(col("attempt"))

  private val q25Sql =
    """SELECT CAST(n_nationkey + 1 AS BIGINT) AS attempt,
      |  CAST(5000 AS BIGINT) AS linear_ms,
      |  CAST((pow(2, least(n_nationkey + 1, 25)) - 1) * 5000 AS BIGINT) AS exp_ms
      |FROM nation
      |ORDER BY attempt""".stripMargin

  /** J1 windowed stream-stream inner join (streams.clj:149-158): view→click
    * conversions within a 10-minute window, keyed by user. The streaming twin
    * (watermarks both sides + time-range condition) is
    * graft.streaming.StreamJoins; state is bounded by the watermark at scale. */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    v.join(c, col("v_user") === col("c_user")
        && col("c_ts") >= col("v_ts")
        && col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private val q26Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_pairs
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE""".stripMargin

  /** J2-complement via left-anti: views with no click inside the window
    * (the rows a left join would emit with a null right side). */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    v.join(c, col("v_user") === col("c_user")
        && col("c_ts") >= col("v_ts")
        && col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"), "left_anti")
      .agg(count(lit(1)).as("n_unmatched"))
  }

  private val q27Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_unmatched
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |WHERE NOT EXISTS (SELECT 1 FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = v.user_id
      |    AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE)""".stripMargin

  /** J3 full-outer per-user activity join: users seen in views, clicks, or
    * both (null side → 0, matching KStreams outer-join emission). */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user")).agg(count(lit(1)).as("vn"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user")).agg(count(lit(1)).as("cn"))
    v.join(c, col("v_user") === col("c_user"), "full_outer")
      .select(coalesce(col("v_user"), col("c_user")).as("user_id"),
        coalesce(col("vn"), lit(0L)).as("n_views"),
        coalesce(col("cn"), lit(0L)).as("n_clicks"))
      .orderBy(col("user_id"))
  }

  private val q28Sql =
    """SELECT coalesce(v.user_id, c.user_id) AS user_id,
      |  CAST(coalesce(vn, 0) AS BIGINT) AS n_views,
      |  CAST(coalesce(cn, 0) AS BIGINT) AS n_clicks
      |FROM (SELECT user_id, count(*) AS vn FROM events
      |      WHERE event_type = 'view' GROUP BY user_id) v
      |FULL OUTER JOIN (SELECT user_id, count(*) AS cn FROM events
      |      WHERE event_type = 'click' GROUP BY user_id) c
      |  ON v.user_id = c.user_id
      |ORDER BY user_id""".stripMargin

  /** S3/E7 batch poll chunking (consumer_handler.clj:98-115, max-poll-records
    * 500): deterministic assignment of the event log into 500-record polls —
    * the relational view of `maxOffsetsPerTrigger` micro-batching. Batch ids
    * are pure id arithmetic against a 1-row broadcast min (the log's ids are
    * densely assigned, as Kafka offsets are per partition) — no global
    * row_number window, so the whole table never funnels through one task. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir).events
    val minId = ev.agg(min(col("event_id")).as("min_id"))
    ev.crossJoin(broadcast(minId))
      .withColumn("batch_id", expr("(event_id - min_id) div 500").cast("long"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id"))
      .orderBy(col("batch_id"))
  }

  private val q29Sql =
    """SELECT (event_id - (SELECT min(event_id) FROM events)) // 500 AS batch_id,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(event_id) AS BIGINT) AS first_id,
      |  CAST(max(event_id) AS BIGINT) AS last_id
      |FROM events
      |GROUP BY 1
      |ORDER BY batch_id""".stripMargin

  /** M1 real proto middleware (middleware/default.clj:36-85): every document
    * is serialized to protobuf wire bytes (graft.functions.ProtoWire — the
    * public wire format, descriptor-driven) and decoded back through
    * `Middleware.proto`; rows with deliberately malformed bytes (invalid
    * wire type 7) take the E9 null/corrupt path. The oracle computes the
    * same aggregate straight from the source columns, so a hash match
    * proves decode ∘ encode ≡ id across every row (unicode payloads
    * included) plus exact corrupt-row routing — all inside whole-stage
    * codegen (one static codec call per row). */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ProtoWire.{ProtoField, ProtoMessage, PType}
    import graft.functions.ProtoFunctions.protoEncode
    val msg = ProtoMessage("document", Seq(
      ProtoField(1, "doc_id", PType.PInt64),
      ProtoField(2, "lang", PType.PString),
      ProtoField(3, "text", PType.PString)))
    val wire = t(s, dir).documents
      .withColumn("value",
        when(col("doc_id") % 97 === 0, lit(Array[Byte](0x0f)))
          .otherwise(protoEncode(
            struct(col("doc_id"), col("lang"), col("text")), msg)))
      .select("value")
    Middleware.proto(msg)(wire)
      .withColumn("lang",
        when(col("message").isNull, "__corrupt__").otherwise(col("message.lang")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("message").isNull, 0L)
          .otherwise(length(col("message.text")))).as("n_chars"),
        sum(when(col("message").isNull, 0L)
          .otherwise(col("message.doc_id"))).as("sum_ids"))
      .orderBy(col("lang"))
  }

  private val q41Sql =
    """SELECT CASE WHEN doc_id % 97 = 0 THEN '__corrupt__' ELSE lang END AS lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE length(text) END) AS BIGINT) AS n_chars,
      |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE doc_id END) AS BIGINT) AS sum_ids
      |FROM documents
      |GROUP BY 1
      |ORDER BY lang""".stripMargin

  /** E6 dead-set view-N (messaging/consumer.clj:84-94): peek the first 20
    * "dead" records (synthetic DLQ = error events) in offset order — the
    * bounded batch read the management HTTP layer performs. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir).events
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
      .limit(20)

  private val q30Sql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'error'
      |ORDER BY event_id
      |LIMIT 20""".stripMargin

  /** Stream-static enrichment join: the stream of events enriched against a
    * slowly-changing dimension (customer → nation), then aggregated — the
    * join family the reference lacks entirely (its only join is
    * stream-stream, `streams.clj:149-158`; GlobalKTable-style enrichment is
    * listed as not-implemented in SURVEY §2.5) and the single most common
    * production streaming topology.
    *
    * Scale design: the dimension broadcasts (stream-static inner join needs
    * no watermark and no state store — each micro-batch probes the
    * broadcast hash relation map-side), so the streaming side never
    * shuffles before the keyed aggregate. EventsStreamSpec proves the
    * identical operators produce the identical result as a real
    * `readStream` query. Money as integer cents. */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir).customer
      .select(col("c_custkey"), col("c_nationkey"))
    t(s, dir).events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("c_nationkey"))
  }

  private val q45Sql =
    """SELECT c_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q20_too_old_filter" -> QueryDef(q20, Some(q20Sql)),
    "q21_delay_histogram" -> QueryDef(q21, Some(q21Sql)),
    "q22_json_middleware" -> QueryDef(q22, Some(q22Sql)),
    "q23_result_dispatch" -> QueryDef(q23, Some(q23Sql)),
    "q24_retry_state" -> QueryDef(q24, Some(q24Sql)),
    "q25_backoff_schedule" -> QueryDef(q25, Some(q25Sql)),
    "q26_stream_join_inner" -> QueryDef(q26, Some(q26Sql), headline = true),
    "q27_stream_join_anti" -> QueryDef(q27, Some(q27Sql)),
    "q28_stream_join_outer" -> QueryDef(q28, Some(q28Sql)),
    "q29_batch_chunks" -> QueryDef(q29, Some(q29Sql)),
    "q30_dead_set_view" -> QueryDef(q30, Some(q30Sql)),
    "q41_proto_middleware" -> QueryDef(q41, Some(q41Sql)),
    "q45_stream_static_enrich" -> QueryDef(q45, Some(q45Sql)),
  )
}
