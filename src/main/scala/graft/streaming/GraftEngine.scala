package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Engine lifecycle (O7, init.clj:33-183 + D1 streams.clj:216-239): wires
  * validated route config into one StreamingQuery per route, with per-route
  * checkpoints, mode-driven subsystem startup, runtime stop/start of
  * individual routes (O2, streams.clj:114-123), and a JVM shutdown hook that
  * stops queries then the HTTP server.
  *
  * Scale mapping of the reference's knobs:
  *  - stream-threads-count (O3)  → spark.sql.shuffle.partitions +
  *    maxFilesPerTrigger/maxOffsetsPerTrigger per route; elastic via AQE.
  *  - channels (D2)              → channel-topic queries started per channel.
  *  - drain-timeout (E11)        → query.stop() completes the in-flight
  *    micro-batch; stopAll enforces the configured drain window.
  */
final class GraftEngine(
    spark: SparkSession,
    cfg: EngineConfig,
    topics: TopicIO,
    checkpointDir: String,
    val metrics: MetricsRegistry = new MetricsRegistry) {

  {
    val errs = EngineConfig.validate(cfg)
    require(errs.isEmpty, s"invalid engine config:\n  ${errs.mkString("\n  ")}")
    spark.streams.addListener(metrics.listener)
  }

  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  val deadSet = new DeadSet(topics, s"$checkpointDir/markers")

  /** Start one stream route: origin-topic stream → Pipeline → foreachBatch
    * dispatch (the driver loop of SURVEY §3.1's Spark equivalent). */
  def startStreamRoute(route: StreamRouteConfig,
      middleware: DataFrame => DataFrame,
      handler: Dispatch.Handler,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = topics.readStream(spark, route.originTopic)
    val piped = Pipeline.observeReads(s"${route.topicEntity}.reads")(
      Pipeline.forRoute(route, middleware)(src))
    val q = piped.writeStream
      .queryName(s"route-${route.topicEntity}")
      .option("checkpointLocation", s"$checkpointDir/${route.topicEntity}")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val counts = Dispatch.dispatch(route, topics, handler)(batch)
        metrics.recordDispatch(route.topicEntity, counts)
      }
      .start()
    queries.put(route.topicEntity, q)
    q
  }

  /** Start the retry-reader query for a route (S4's replacement): stream the
    * retry topic, release due records, re-apply the route's middleware (the
    * reference's retry consumers re-run the wrapped mapper-func,
    * messaging/consumer.clj:137-148), and re-dispatch through the same
    * handler. Not-yet-due records are re-appended (their stamp unchanged) so
    * they surface again next trigger — the TTL-requeue analogue. */
  def startRetryReader(route: StreamRouteConfig,
      middleware: DataFrame => DataFrame,
      handler: Dispatch.Handler,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val entity = route.topicEntity
    val src = topics.readStream(spark, EngineConfig.retryTopic(entity))
    val q = src.writeStream
      .queryName(s"retry-$entity")
      .option("checkpointLocation", s"$checkpointDir/retry-$entity")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.cache()
        try {
          val due = RetryEngine.due(cached)
          val notDue = cached.exceptAll(due)
          if (!notDue.isEmpty) topics.append(notDue,
            EngineConfig.retryTopic(entity))
          val counts = Dispatch.dispatch(route, topics, handler)(
            middleware(Pipeline.enrichMetadata(due)))
          metrics.recordDispatch(entity, counts)
        } finally cached.unpersist()
      }
      .start()
    queries.put(s"retry-$entity", q)
    q
  }

  /** Start a channel worker (D2/E2, mapper.clj:71-111): consumes the
    * channel's topic with its own handler and channel-scoped retry config —
    * the RabbitMQ-worker analogue whose parallelism is decoupled from the
    * origin topic's partitions (workerCount → per-trigger repartition). */
  def startChannelWorker(route: StreamRouteConfig, channelName: String,
      middleware: DataFrame => DataFrame,
      handler: Dispatch.Handler,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val entity = route.topicEntity
    val ch = route.channels.getOrElse(channelName,
      throw new IllegalArgumentException(
        s"route '$entity' has no channel '$channelName'"))
    // channel-scoped retry cycle: its own retry/DLQ topics
    val chRoute = route.copy(
      topicEntity = s"${entity}_channel_$channelName",
      retry = ch.retry, channels = Map.empty)
    val src = topics.readStream(spark,
      EngineConfig.channelTopic(entity, channelName))
    val q = src.writeStream
      .queryName(s"channel-$entity-$channelName")
      .option("checkpointLocation", s"$checkpointDir/channel-$entity-$channelName")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spread = if (ch.workerCount > 1)
          batch.repartition(ch.workerCount) else batch
        val counts = Dispatch.dispatch(chRoute, topics, handler)(
          middleware(Pipeline.enrichMetadata(spread)))
        metrics.recordDispatch(chRoute.topicEntity, counts)
      }
      .start()
    queries.put(s"channel-$entity-$channelName", q)
    q
  }

  /** Start the instant-topic worker: consumes records the dead-set replay
    * re-published (messaging/consumer.clj:137-148's instant-queue
    * subscribers) through the same middleware + handler. */
  def startInstantWorker(route: StreamRouteConfig,
      middleware: DataFrame => DataFrame,
      handler: Dispatch.Handler,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val entity = route.topicEntity
    val src = topics.readStream(spark, EngineConfig.instantTopic(entity))
    val q = src.writeStream
      .queryName(s"instant-$entity")
      .option("checkpointLocation", s"$checkpointDir/instant-$entity")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val counts = Dispatch.dispatch(route, topics, handler)(
          middleware(Pipeline.enrichMetadata(batch)))
        metrics.recordDispatch(entity, counts)
      }
      .start()
    queries.put(s"instant-$entity", q)
    q
  }

  /** O2: stop/restart a single route's query at runtime. */
  def stopRoute(name: String): Boolean =
    Option(queries.remove(name)).map { q => q.stop(); true }.getOrElse(false)

  def runningQueries: Map[String, StreamingQuery] =
    queries.asScala.toMap.filter(_._2.isActive)

  def awaitAll(): Unit = queries.asScala.values.foreach(_.awaitTermination())

  /** E11 drain: stop everything, bounded by drainTimeoutMs per query. */
  def stopAll(): Unit = queries.asScala.values.foreach { q =>
    try q.stop() catch { case _: Throwable => () }
  }

  sys.addShutdownHook { stopAll() }
}
