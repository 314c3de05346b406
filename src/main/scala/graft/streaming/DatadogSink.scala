package graft.streaming

import java.nio.charset.StandardCharsets

/** Datadog HTTP series sink — the [[MetricsSink]] twin of the reference's
  * vendored push reporter (its metrics/datadog/DatadogReporter.java +
  * transport/HttpTransport.java, which POST dropwizard metrics to
  * the public Datadog v1 series API). The StatsD sink already covers the
  * agent-ingest path (DogStatsD tags); this covers the agent-less direct
  * HTTP path, completing the parity pair.
  *
  * Wire format is the PUBLIC Datadog API (docs.datadoghq.com/api/):
  * `POST <endpoint>/series` with the key in the `DD-API-KEY` header
  * (never the URL — query params leak into access logs) and body
  * `{"series":[{"metric":"p.ns.m","points":[[<epoch_s>,<v>]],
  * "type":"count"|"gauge","tags":["k:v",...]}]}` — counters map to
  * `count`, timings to a `gauge` of milliseconds, gauges to `gauge`
  * (the same mapping the reference's DatadogCounter/DatadogGauge pair
  * produces).
  *
  * Buffering is deterministic, not timer-driven: points accumulate and
  * flush when `batchSize` is reached, on [[flush]], and on [[terminate]]
  * (a production deploy calls flush from its reporting scheduler — the
  * reference's ScheduledReporter cadence). The hot path never throws:
  * HTTP failures drop the batch (metrics loss must not kill a stream),
  * matching the sink contract. `endpoint` is injectable so tests run
  * against a local server (and nothing in this container needs egress).
  */
final class DatadogHttpSink(
    endpoint: String,
    apiKey: String,
    prefix: String = "graft",
    batchSize: Int = 64,
    clockEpochS: () => Long = () => System.currentTimeMillis() / 1000L)
    extends MetricsSink {

  /** Buffered points keyed by (metric, type, rendered tags, epoch-second).
    * Counters within one key SUM; gauges/timings overwrite (last wins).
    * Without the merge, every increment became its own series point
    * stamped at second resolution, and the Datadog v1 API keeps ONE
    * value per (series, timestamp) — 100 increments/sec of one counter
    * stored as ~1/sec. The reference's DatadogReporter submits
    * interval-aggregated values for the same reason. LinkedHashMap keeps
    * first-seen order so flushes are deterministic. */
  private val buf = new scala.collection.mutable.LinkedHashMap[
    (String, String, String, Long), Double]()

  private def name(namespace: String, metric: String): String =
    Seq(prefix, namespace, metric).filter(_.nonEmpty).mkString(".")

  private def esc(s: String): String = JsonText.escape(s)

  private def tagsJson(tags: Map[String, String]): String =
    tags.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(s"$k:$v") + "\"" }
      .mkString("[", ",", "]")

  private def seriesJson(key: (String, String, String, Long),
      value: Double): String = {
    val (metric, tpe, tags, epochS) = key
    val v =
      if (value == value.toLong.toDouble) value.toLong.toString
      else BigDecimal(value).bigDecimal.toPlainString
    s"""{"metric":"${esc(metric)}","points":[[$epochS,$v]],""" +
      s""""type":"$tpe","tags":$tags}"""
  }

  private def add(metric: String, tpe: String, tags: Map[String, String],
      value: Double, sum: Boolean): Unit = {
    val key = (metric, tpe, tagsJson(tags), clockEpochS())
    val toSend = buf.synchronized {
      buf.update(key,
        if (sum) buf.getOrElse(key, 0.0) + value else value)
      if (buf.size >= batchSize) drainLocked() else Nil
    }
    if (toSend.nonEmpty) post(toSend)
  }

  /** Caller must hold buf's monitor. */
  private def drainLocked(): List[String] = {
    val b = buf.toList.map { case (k, v) => seriesJson(k, v) }
    buf.clear(); b
  }

  /** Push any buffered points now. */
  def flush(): Unit = {
    val toSend = buf.synchronized { drainLocked() }
    if (toSend.nonEmpty) post(toSend)
  }

  private def post(series: List[String]): Unit =
    try {
      // key travels in the DD-API-KEY header (the current Datadog API
      // form), never in the URL — query params leak credentials into
      // server/proxy access logs
      val url = java.net.URI.create(s"$endpoint/series").toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("DD-API-KEY", apiKey)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      conn.setDoOutput(true)
      val body = series.mkString("""{"series":[""", ",", "]}")
        .getBytes(StandardCharsets.UTF_8)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
      conn.getResponseCode // drive the request; status ignored by design
      conn.disconnect()
    } catch {
      // the hot path never throws: a malformed endpoint raises
      // IllegalArgumentException from URI.create, not IOException, and
      // must drop the batch just like a network failure does
      case scala.util.control.NonFatal(_) => ()
    }

  override def updateCounter(
      namespace: String, metric: String,
      tags: Map[String, String], signedVal: Long): Unit =
    add(name(namespace, metric), "count", tags, signedVal.toDouble,
      sum = true)

  override def updateTiming(
      namespace: String, metric: String,
      tags: Map[String, String], valueMs: Long): Unit =
    add(name(namespace, metric), "gauge", tags, valueMs.toDouble,
      sum = false)

  override def updateGauge(
      namespace: String, metric: String,
      tags: Map[String, String], value: Double): Unit =
    // NaN/Infinity: drop the point — BigDecimal(NaN) in seriesJson
    // throws NumberFormatException and the sink must never throw into
    // the hot path (same guard as StatsdSink.updateGauge)
    if (java.lang.Double.isFinite(value))
      add(name(namespace, metric), "gauge", tags, value, sum = false)

  override def terminate(): Unit = flush()
}
