package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Metrics facade (O4, metrics.clj:40-150): counters + gauges fed from two
  * directions — explicit increments from the dispatcher (per-disposition
  * counts) and `observe()` rows harvested by a StreamingQueryListener.
  * Pluggable reporters (Prometheus/StatsD in the reference) reduce to a
  * snapshot() any exporter can scrape; the management HTTP layer exposes it
  * as JSON.
  */
final class MetricsRegistry {
  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, Double]()

  def increment(name: String, delta: Long = 1L): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(delta)

  def gauge(name: String, value: Double): Unit = gauges.put(name, value)

  def count(name: String): Long =
    Option(counters.get(name)).map(_.sum).getOrElse(0L)

  def snapshot(): Map[String, Double] =
    counters.asScala.map { case (k, v) => k -> v.sum.toDouble }.toMap ++
      gauges.asScala.toMap

  /** (counters, gauges) separately — exporters that distinguish metric
    * types (Prometheus TYPE lines) need the split. */
  def typedSnapshot(): (Map[String, Long], Map[String, Double]) =
    (counters.asScala.map { case (k, v) => k -> v.sum }.toMap,
      gauges.asScala.toMap)

  def recordDispatch(entity: String, c: Dispatch.Counts): Unit = {
    increment(s"$entity.message.success", c.success)
    increment(s"$entity.message.skip", c.skip)
    increment(s"$entity.message.retry", c.retried)
    increment(s"$entity.message.dead_letter", c.deadLettered)
    increment(s"$entity.message.channel", c.toChannels)
  }

  /** Harvests `observe()` metrics (Pipeline.observeReads) from streaming
    * progress events. Register with
    * `spark.streams.addListener(registry.listener)`. */
  val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      increment("query.terminated")
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      e.progress.observedMetrics.asScala.foreach { case (name, row) =>
        row.schema.fieldNames.foreach { f =>
          val v = row.getAs[Any](f)
          v match {
            case n: Number => gauge(s"$name.$f", n.doubleValue())
            case _ => ()
          }
        }
      }
    }
  }
}
