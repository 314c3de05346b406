package graft

import graft.streaming._
import graft.server.ManagementServer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** End-to-end engine demo (and verification surface): wires a stream route
  * with JSON middleware through dispatch, exercises the retry→DLQ cycle,
  * and serves the management HTTP API for external probing.
  *
  * Usage: runMain graft.EngineDemo [holdSeconds]
  * Prints `DEMO_PORT=<port>` once the HTTP server is up.
  */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val hold = args.headOption.map(_.toInt).getOrElse(0)
    val spark = GraftSession.build("graft-demo", "local[4]", 4)

    val base = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val topics = new FileTopicIO(s"$base/topics")
    val route = StreamRouteConfig(
      topicEntity = "orders", originTopic = "orders_origin",
      retry = RetryConfig(enabled = true, count = 1,
        backoffType = BackoffType.Linear, queueTimeoutMs = 0L))
    val cfg = EngineConfig(streamRoutes = Map("orders" -> route))
    val engine = new GraftEngine(spark, cfg, topics, s"$base/ckpt")

    // seed: two good JSON messages, one corrupt, one business failure
    val now = new java.sql.Timestamp(System.currentTimeMillis)
    val sess = spark
    import sess.implicits._
    val seed = Seq(
      ("a", """{"amount": 10}"""), ("b", """{"amount": 20}"""),
      ("c", "corrupt-not-json"), ("d", """{"amount": -1}""")
    ).zipWithIndex.map { case ((k, v), i) =>
      Envelope(k.getBytes, v.getBytes, "orders_origin", 0, i.toLong, now, "orders")
    }.toDF()
    topics.append(seed, "orders_origin")

    val schema = StructType(Seq(StructField("amount", IntegerType)))
    val handler = Dispatch.ExprHandler(
      when(col("message").isNull, "dead_letter")        // corrupt → DLQ (E9)
        .when(col("message.amount") < 0, "retry")       // business failure
        .otherwise("success"))

    engine.startStreamRoute(route, Middleware.json(schema), handler,
      Trigger.AvailableNow()).awaitTermination()
    // retry hop: count 1 → 0, then exhaustion → DLQ
    engine.startRetryReader(route, Middleware.json(schema), handler, Trigger.AvailableNow())
      .awaitTermination()
    engine.stopRoute("retry-orders")
    engine.startRetryReader(route, Middleware.json(schema), handler, Trigger.AvailableNow())
      .awaitTermination()

    println(s"METRICS=${engine.metrics.snapshot().toSeq.sortBy(_._1)}")
    println(s"DLQ_COUNT=${topics.read(spark, "orders_dead_letter").count()}")

    val server = new ManagementServer(spark, engine, 0)
    server.start()
    println(s"DEMO_PORT=${server.boundPort}")
    Console.flush()
    Thread.sleep(hold * 1000L)
    server.stop(); engine.stopAll(); spark.stop()
  }
}
