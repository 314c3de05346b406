package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** Pluggable metrics backend — the Spark mirror of the reference's
  * MetricsProtocol (metrics_interface.clj:41-44: initialize / terminate /
  * update-counter / update-timing). Implementations receive the already-split
  * (namespace, metric) pair plus free-form tags, exactly the shape the
  * reference hands its statsd/dropwizard wrappers
  * (clj_statsd_metrics_wrapper.clj:29-38).
  *
  * Sinks are FAN-OUT targets of [[MetricsRegistry]]: the registry remains the
  * source of truth for the JSON / Prometheus snapshots; sinks see each update
  * as it happens (push model), so a StatsD/telegraf pipeline gets per-event
  * deltas rather than scrape-time totals. A sink must never throw into the
  * hot path — the registry does not guard calls, so implementations swallow
  * their own IO failures (metrics loss must not kill a stream).
  */
/** The ONE JSON string escaper (management HTTP + Datadog sink): quote,
  * backslash, and all control chars < 0x20 — an unescaped newline in a
  * tag or metric name malforms the WHOLE body it rides in. */
private[graft] object JsonText {
  def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

trait MetricsSink {
  def updateCounter(
      namespace: String, metric: String,
      tags: Map[String, String], signedVal: Long): Unit

  def updateTiming(
      namespace: String, metric: String,
      tags: Map[String, String], valueMs: Long): Unit

  def updateGauge(
      namespace: String, metric: String,
      tags: Map[String, String], value: Double): Unit

  /** Clean shutdown (metrics_interface.clj `terminate`). */
  def terminate(): Unit = ()
}

/** `{:statsd {:host .. :port .. :enabled ..}}` — config.clj's statsd section
  * verbatim (the reference reads it at `[:ziggurat :statsd]` and only
  * initializes the wrapper when `enabled`). */
final case class StatsdConfig(
    host: String = "localhost",
    port: Int = 8125,
    enabled: Boolean = false)

/** StatsD line-protocol sink over UDP — the engine-side equivalent of
  * clj_statsd_metrics_wrapper.clj (which shells out to the clj-statsd
  * client). Emits the public statsd wire format, one metric per datagram:
  *
  *   `prefix.namespace.metric:<value>|c`   counter (signed delta)
  *   `prefix.namespace.metric:<value>|ms`  timing
  *   `prefix.namespace.metric:<value>|g`   gauge
  *
  * with DogStatsD-style tags appended as `|#k:v,k2:v2` (the same rendering
  * clj-statsd's `:tags` option produces, clj_statsd_metrics_wrapper.clj:23-27).
  * Tags are sorted by key so emission is deterministic. UDP send failures are
  * swallowed: statsd is fire-and-forget by design and a dead telegraf must
  * not take the pipeline down with it.
  */
final class StatsdSink(host: String, port: Int, prefix: String = "graft")
    extends MetricsSink {

  private val socket = new DatagramSocket()
  /** Resolved lazily INSIDE send()'s swallowed try, cached WITH A TTL:
    * resolving in the constructor made a DNS blip for the statsd host
    * (agent not up yet) throw UnknownHostException out of engine boot —
    * violating the contract that metrics loss never takes the pipeline
    * down. Until DNS resolves, sends are silently dropped (statsd is
    * fire-and-forget). The cache expires after [[resolveTtlMs]] rather
    * than pinning the first success forever: containerized statsd agents
    * get rescheduled to new IPs, and a permanent pin would silently send
    * every later metric to the stale address for the life of the sink.
    * If a re-resolve fails while a prior answer exists, the stale address
    * keeps being used (better than dropping) and its stamp is refreshed
    * so DNS is retried at TTL cadence, not per datagram. */
  private[streaming] val resolveTtlMs: Long = 5 * 60 * 1000L
  @volatile private var resolved: (InetAddress, Long) = null

  private def name(namespace: String, metric: String): String =
    Seq(prefix, namespace, metric).filter(_.nonEmpty).mkString(".")

  private def tagSuffix(tags: Map[String, String]): String =
    if (tags.isEmpty) ""
    else "|#" + tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k:$v" }.mkString(",")

  private def send(line: String): Unit =
    try {
      val now = System.currentTimeMillis()
      val cached = resolved
      val address =
        if (cached != null && now - cached._2 < resolveTtlMs) cached._1
        else try {
          val r = InetAddress.getByName(host); resolved = (r, now); r
        } catch {
          case e: java.net.UnknownHostException =>
            if (cached == null) throw e
            // DNS blip with a prior answer: keep the stale address and
            // re-stamp so the retry happens at TTL cadence
            resolved = (cached._1, now); cached._1
        }
      val bytes = line.getBytes(StandardCharsets.UTF_8)
      socket.send(new DatagramPacket(bytes, bytes.length, address, port))
    } catch { case _: java.io.IOException => () }

  override def updateCounter(
      namespace: String, metric: String,
      tags: Map[String, String], signedVal: Long): Unit =
    send(s"${name(namespace, metric)}:$signedVal|c${tagSuffix(tags)}")

  override def updateTiming(
      namespace: String, metric: String,
      tags: Map[String, String], valueMs: Long): Unit =
    send(s"${name(namespace, metric)}:$valueMs|ms${tagSuffix(tags)}")

  override def updateGauge(
      namespace: String, metric: String,
      tags: Map[String, String], value: Double): Unit =
    // NaN/Infinity: drop the point — BigDecimal(NaN) throws
    // NumberFormatException OUTSIDE send()'s swallowed-IOException try,
    // and the sink contract is never-throw-into-the-hot-path (a
    // user-computed 0/0 ratio gauge must not kill the streaming query)
    if (java.lang.Double.isFinite(value)) {
      // statsd gauges have no exponent syntax; render plain decimal
      val v =
        if (value == value.toLong.toDouble) value.toLong.toString
        else BigDecimal(value).bigDecimal.toPlainString
      val line = s"${name(namespace, metric)}:$v|g${tagSuffix(tags)}"
      // a sign-prefixed gauge value is a DELTA in the statsd line
      // protocol ("name:-5|g" decrements the stored gauge), not an
      // absolute set — the standard absolute-set spelling for a
      // negative value is a zero-set followed by the decrement in the
      // SAME datagram (newline-separated metrics are one payload)
      if (value < 0)
        send(s"${name(namespace, metric)}:0|g${tagSuffix(tags)}\n$line")
      else send(line)
    }

  override def terminate(): Unit = socket.close()
}
