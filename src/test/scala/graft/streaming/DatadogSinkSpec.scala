package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** DatadogHttpSink: emits the PUBLIC Datadog v1 series wire format
  * (POST /series with the key in the DD-API-KEY header — never the
  * URL, which proxies log — and a {"series":[...]} JSON body), maps
  * counter→count and timing/gauge→gauge like the reference's vendored
  * reporter, batches deterministically, and never throws into the hot
  * path when the endpoint is down. */
class DatadogSinkSpec extends AnyFunSuite {

  /** Tiny JDK-builtin HTTP capture server; records
    * (path?DD-API-KEY-header, body). */
  private def withServer[A](
      body: (String, () => List[(String, String)]) => A): A = {
    val received =
      new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1", exchange => {
      val bytes = exchange.getRequestBody.readAllBytes()
      val uri = exchange.getRequestURI
      val key = exchange.getRequestHeaders.getFirst("DD-API-KEY")
      received.add((s"${uri.getPath}?key=$key&q=${uri.getQuery}",
        new String(bytes, StandardCharsets.UTF_8)))
      exchange.sendResponseHeaders(202, -1)
      exchange.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api/v1",
      () => { import scala.jdk.CollectionConverters._
        received.asScala.toList })
    finally server.stop(0)
  }

  test("counter/timing/gauge render as Datadog series JSON with sorted " +
      "tags, fixed timestamps, and the key in the DD-API-KEY header " +
      "(never the URL)") {
    withServer { (endpoint, received) =>
      val sink = new DatadogHttpSink(endpoint, apiKey = "k123",
        clockEpochS = () => 1700000000L)
      sink.updateCounter("message", "read_count",
        Map("topic" -> "orders", "env" -> "prod"), 3L)
      sink.updateTiming("handler", "latency", Map.empty, 42L)
      sink.updateGauge("state", "rows", Map("op" -> "dedup"), 17.5)
      sink.flush()
      val got = received()
      assert(got.size == 1, s"one batched POST expected: $got")
      val (pathQ, body) = got.head
      assert(pathQ == "/api/v1/series?key=k123&q=null",
        s"key must travel in the DD-API-KEY header, not the URL: $pathQ")
      assert(body.startsWith("""{"series":["""))
      assert(body.contains(
        """{"metric":"graft.message.read_count","points":[[1700000000,3]],""" +
          """"type":"count","tags":["env:prod","topic:orders"]}"""))
      assert(body.contains(
        """{"metric":"graft.handler.latency","points":[[1700000000,42]],""" +
          """"type":"gauge","tags":[]}"""))
      assert(body.contains(
        """{"metric":"graft.state.rows","points":[[1700000000,17.5]],""" +
          """"type":"gauge","tags":["op:dedup"]}"""))
    }
  }

  test("batchSize triggers an automatic flush; terminate drains the rest") {
    withServer { (endpoint, received) =>
      val sink = new DatadogHttpSink(endpoint, apiKey = "k",
        batchSize = 2, clockEpochS = () => 1L)
      sink.updateCounter("a", "x", Map.empty, 1L)
      assert(received().isEmpty, "below batch size: buffered")
      sink.updateCounter("a", "y", Map.empty, 1L)
      assert(received().size == 1, "batch size reached: one POST")
      sink.updateCounter("a", "z", Map.empty, 1L)
      sink.terminate()
      assert(received().size == 2, "terminate flushes the partial batch")
      assert(received()(1)._2.contains("\"graft.a.z\""))
    }
  }

  test("registry fan-out: dispatch counts arrive over HTTP end-to-end") {
    withServer { (endpoint, received) =>
      val reg = new MetricsRegistry()
      val sink = new DatadogHttpSink(endpoint, "k", batchSize = 1)
      reg.addSink(sink)
      reg.increment("message.processed", 1L, Map("topic_name" -> "t1"))
      assert(received().size == 1)
      assert(received().head._2.contains("graft.message.processed"))
      assert(received().head._2.contains("topic_name:t1"))
      reg.terminateSinks()
    }
  }

  test("same-second increments of one counter MERGE into a single summed " +
      "point: the Datadog v1 API keeps ONE value per (series, timestamp), " +
      "so unmerged per-increment points undercount to ~1/sec") {
    withServer { (endpoint, received) =>
      val sink = new DatadogHttpSink(endpoint, "k",
        clockEpochS = () => 1700000000L)
      sink.updateCounter("m", "c", Map("t" -> "x"), 2L)
      sink.updateCounter("m", "c", Map("t" -> "x"), 3L)
      // distinct tags are a distinct series — never merged
      sink.updateCounter("m", "c", Map("t" -> "y"), 1L)
      sink.flush()
      val body = received().head._2
      assert(body.contains(
        """{"metric":"graft.m.c","points":[[1700000000,5]],""" +
          """"type":"count","tags":["t:x"]}"""), body)
      assert(body.contains(
        """[[1700000000,1]],"type":"count","tags":["t:y"]"""), body)
    }
  }

  test("control characters in tags escape to \\u00XX: one pasted newline " +
      "must not malform the whole batch body (the POST is all-or-nothing)") {
    withServer { (endpoint, received) =>
      val sink = new DatadogHttpSink(endpoint, "k", clockEpochS = () => 1L)
      sink.updateCounter("m", "c", Map("t" -> "a\nb"), 1L)
      sink.flush()
      val body = received().head._2
      assert(body.contains("t:a\\u000ab"), body)
    }
  }

  test("a dead endpoint never throws into the hot path") {
    // connect to a closed port: IOException swallowed, batch dropped
    val sink = new DatadogHttpSink("http://127.0.0.1:1/api/v1", "k",
      batchSize = 1)
    sink.updateCounter("a", "b", Map.empty, 1L)
    sink.updateGauge("a", "g", Map.empty, 2.0)
    sink.terminate()
    succeed
  }
}
