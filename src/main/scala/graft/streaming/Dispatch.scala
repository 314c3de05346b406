package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Handler invocation + result-code dispatch — the heart of the reference
  * (E1/E2, mapper.clj:28-111), re-expressed for micro-batch execution.
  *
  * A [[Handler]] adds a `disposition` column to the batch (declaratively —
  * a Column expression keeps the hot path in codegen; arbitrary Scala via
  * typed map is possible but discouraged). The dispatcher then routes
  * sub-frames:
  *
  *   success / skip       → counted (metrics), not persisted
  *   retry                → RetryEngine.splitRetries → retry topic / DLQ
  *   dead_letter          → DLQ topic
  *   channel:<name>       → that channel's topic (D2)
  *   unknown code         → treated as retry + failure metric, matching the
  *                          reference's catch-all (mapper.clj:66-69 routes
  *                          any thrown exception to retry)
  *
  * Dispatch runs inside foreachBatch: every sink write for one micro-batch
  * either completes before the checkpoint commits or replays wholesale —
  * at-least-once, strictly stronger than the reference's manual ack
  * (SURVEY §7.3.1). Replay idempotence is TRANSPORT-scoped: the emit path
  * keys every write by a `<query>-<batchId>` token and transports that
  * implement `appendIdempotent` (the file transport records applied
  * tokens) make replays exact no-ops; the Kafka sink has no transactional
  * producer, so there a replayed micro-batch may re-publish — standard
  * Kafka at-least-once, and safe to reprocess: duplicates carry the same
  * `graft.*` retry state, so they converge through the same retry/DLQ
  * cycle rather than compounding.
  */
object Dispatch {

  /** A handler adds `disposition` (see Envelope.Code) to a batch. */
  trait Handler extends Serializable {
    def apply(batch: DataFrame): DataFrame
  }

  /** Declarative handler from a Column expression — the recommended form. */
  final case class ExprHandler(disposition: Column) extends Handler {
    def apply(batch: DataFrame): DataFrame =
      batch.withColumn("disposition", disposition)
  }

  /** `invalid` counts handler returns outside the recognized codes
    * (typo'd channels, null, arbitrary strings) — those records ALSO
    * count under `retried`/`deadLettered` as they flow through the
    * catch-all retry cycle; the separate count is the failure signal
    * the contract doc promises. */
  final case class Counts(success: Long, skip: Long, retried: Long,
      deadLettered: Long, toChannels: Long, invalid: Long = 0L)

  /** Emit through the idempotent path when a replay token is present
    * (SURVEY §7.3.1: replayed micro-batches must not double-publish). */
  private def emit(topics: TopicIO, df: DataFrame, topic: String,
      token: Option[String]): Unit = token match {
    case Some(t) => topics.appendIdempotent(df, topic, t)
    case None => topics.append(df, topic)
  }

  /** Dispatch one micro-batch for a route. Returns per-disposition counts
    * (the metrics the reference emits per message, mapper.clj:33-54).
    * `token` = `<query>-<batchId>` makes every sink write replay-safe. */
  def dispatch(route: StreamRouteConfig, topics: TopicIO, handler: Handler,
      token: Option[String] = None)(
      batch: DataFrame): Counts = {
    import Envelope.Code
    val entity = route.topicEntity
    // only the route's CONFIGURED channels are recognized dispositions:
    // the emit loop below writes those and nothing else, so letting an
    // arbitrary `channel:*` string through normalization would drop the
    // record silently (written to no topic, counted nowhere). An
    // unconfigured channel name — a typo, or a handler shared across
    // differently-configured routes — takes the documented catch-all to
    // Retry instead (mapper.clj's unrecognized-return contract).
    val knownChannels = route.channels.keys.map(Code.channel).toSeq
    val known = Set(Code.Success, Code.Skip, Code.Retry, Code.DeadLetter) ++
      knownChannels
    // ORIGINAL dispositions are kept (nulls named) so the tallies can
    // COUNT the catch-all instead of erasing it: the old normalization
    // folded unknown codes into Retry before counting, so a typo'd
    // channel name was operationally indistinguishable from genuine
    // handler failures — rising retry/DLQ metrics with no signal that
    // the handler was returning garbage. Unknown codes still take the
    // documented catch-all to Retry (mapper.clj's unrecognized-return
    // contract), now surfaced via Counts.invalid → `.message.invalid`.
    val handled = handler(batch)
      .withColumn("disposition",
        coalesce(col("disposition"), lit("invalid:null")))
      .cache()
    val retryBound = col("disposition") === Code.Retry ||
      !col("disposition").isin(known.toSeq: _*)
    try {
      // Single aggregation job over the cached batch yields every
      // disposition count plus the retryable/exhausted split — the hot path
      // of every route runs ONE count job per trigger, not one per
      // disposition class (five actions at r2; the per-trigger latency
      // multiplier the round-2 audit flagged).
      val tallies = dispositionTallies(handled,
        if (route.retry.enabled) Some(route.retry) else None,
        retryBound = retryBound)
      val success = tallies.total(Code.Success)
      val skip = tallies.total(Code.Skip)
      val invalidN = tallies.invalid(known)
      // retried/exhausted include the catch-all rows: the written set
      // below filters on the same retryBound predicate, so counted and
      // emitted can never drift
      val retried = tallies.live(Code.Retry) + tallies.liveOutside(known)
      val exhaustedN =
        tallies.exhausted(Code.Retry) + tallies.exhaustedOutside(known)

      val toRetry = handled.filter(retryBound).drop("disposition")
      val (retryable, exhausted) =
        if (route.retry.enabled) RetryEngine.splitRetries(route.retry, toRetry)
        // retries disabled → straight to the DLQ, count untouched
        else (toRetry.limit(0), toRetry)

      if (retried > 0)
        emit(topics, retryable, EngineConfig.retryTopic(entity), token)
      val deadLettered = tallies.total(Code.DeadLetter) + exhaustedN
      if (deadLettered > 0) {
        val dead = handled.filter(col("disposition") === Code.DeadLetter)
          .drop("disposition")
        emit(topics, dead.unionByName(exhausted, allowMissingColumns = true),
          EngineConfig.deadLetterTopic(entity), token)
      }

      var toChannels = 0L
      route.channels.keys.foreach { ch =>
        val n = tallies.total(Code.channel(ch))
        if (n > 0)
          // channel publication starts a FRESH retry cycle: carrying the
          // origin route's residual retryCount into the channel topic
          // made the channel worker's enrichMetadata report phantom
          // retry hops and splitRetries exhaust the record early (a
          // record that burned 3 of 5 origin retries arrived with only
          // 2 of the channel's own budget left)
          emit(topics, handled.filter(col("disposition") === Code.channel(ch))
            .drop("disposition")
            .withColumn("retryCount", lit(null).cast("int"))
            .withColumn("nextAttemptAt", lit(null).cast("timestamp")),
            EngineConfig.channelTopic(entity, ch), token)
        toChannels += n
      }
      Counts(success, skip, retried, deadLettered, toChannels, invalidN)
    } finally handled.unpersist()
  }

  /** Per-(disposition, exhausted?) counts from one groupBy job. A retry
    * row is "exhausted" per [[RetryEngine.exhaustedCol]] — the SAME
    * criterion splitRetries routes to the DLQ with, so the counted and
    * written sets cannot drift — or always when retries are disabled for
    * the route (retryCfg = None). */
  private final case class Tallies(m: Map[(String, Boolean), Long]) {
    def total(code: String): Long =
      m.collect { case ((c, _), n) if c == code => n }.sum
    def live(code: String): Long = m.getOrElse((code, false), 0L)
    def exhausted(code: String): Long = m.getOrElse((code, true), 0L)
    def invalid(allowed: Set[String]): Long =
      m.collect { case ((c, _), n) if !allowed.contains(c) => n }.sum
    def liveOutside(allowed: Set[String]): Long =
      m.collect { case ((c, false), n) if !allowed.contains(c) => n }.sum
    def exhaustedOutside(allowed: Set[String]): Long =
      m.collect { case ((c, true), n) if !allowed.contains(c) => n }.sum
  }

  /** `retryBound` names the rows that will flow into the retry cycle —
    * Retry plus the stream path's unknown-code catch-all — so the
    * exhausted flag is computed for exactly the rows splitRetries will
    * split, keeping counted and written sets identical. */
  private def dispositionTallies(handled: DataFrame,
      retryCfg: Option[RetryConfig],
      retryBound: Column = col("disposition") === Envelope.Code.Retry)
      : Tallies = {
    val exhaustedFlag = retryCfg match {
      case Some(cfg) =>
        retryBound && coalesce(RetryEngine.exhaustedCol(cfg), lit(false))
      case None => retryBound
    }
    Tallies(handled
      .groupBy(col("disposition"), exhaustedFlag.as("exhausted"))
      .count().collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap)
  }

  /** E7 batch-route contract (kafka_consumer/consumer_handler.clj:36-73):
    * the batch handler's output must contain only skip/retry dispositions;
    * anything else is an invalid return (InvalidReturnTypeException in the
    * reference). */
  def dispatchBatchRoute(route: BatchRouteConfig, topics: TopicIO,
      handler: Handler, token: Option[String] = None)(
      batch: DataFrame): Counts = {
    import Envelope.Code
    // a NULL disposition is an invalid return like any other string
    // outside {skip, retry} — but unnormalized it reached the tallies
    // as SQL NULL, where the exhausted grouping flag went NULL too and
    // Row.getBoolean NPE'd before the curated contract error below
    // could name the route and the violation
    val handled = handler(batch)
      .withColumn("disposition",
        coalesce(col("disposition"), lit("invalid:null")))
      .cache()
    try {
      // same single-pass tallies as dispatch: one count job per poll
      val tallies = dispositionTallies(handled,
        if (route.retry.enabled) Some(route.retry) else None)
      if (tallies.invalid(Set(Code.Skip, Code.Retry)) > 0)
        throw new IllegalArgumentException(
          s"batch handler for '${route.topicEntity}' returned dispositions " +
            "outside {skip, retry}")
      val skip = tallies.total(Code.Skip)
      val toRetry = handled.filter(col("disposition") === Code.Retry)
        .drop("disposition")
      val (retryable, exhausted) =
        if (route.retry.enabled) RetryEngine.splitRetries(route.retry, toRetry)
        else (toRetry.limit(0), toRetry)
      val retried = tallies.live(Code.Retry)
      if (retried > 0)
        emit(topics, retryable,
          EngineConfig.retryTopic(route.topicEntity), token)
      val deadLettered = tallies.exhausted(Code.Retry)
      if (deadLettered > 0)
        emit(topics, exhausted,
          EngineConfig.deadLetterTopic(route.topicEntity), token)
      Counts(0, skip, retried, deadLettered, 0)
    } finally handled.unpersist()
  }
}
