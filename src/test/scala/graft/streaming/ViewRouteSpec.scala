package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The serving-state route: source → too-old filter → middleware →
  * UpsertSink view, exactly-once across checkpoint restarts. */
class ViewRouteSpec extends SparkSuite {

  private def now = new java.sql.Timestamp(System.currentTimeMillis)

  test("view route materializes latest-per-key from a stream route and " +
      "stays exactly-once across a checkpointed restart") {
    val dir = tmpDir("viewroute")
    val topics = new FileTopicIO(s"$dir/topics")
    val route = StreamRouteConfig("v", "v_origin")
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map("v" -> route)), topics, s"$dir/ckpt")
    val sink = new UpsertSink(spark, s"$dir/state", "k", "ord",
      queryId = "view-v")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("ord", LongType)))
    val project = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("message.k").as("k"), col("message.v").as("v"),
        col("message.ord").as("ord"))

    topics.append(envelopes("v", Seq(
      ("a", """{"k": 1, "v": "one", "ord": 1}""", now),
      ("b", """{"k": 2, "v": "two", "ord": 1}""", now),
      ("a", """{"k": 1, "v": "one-newer", "ord": 2}""", now))), "v_origin")
    engine.startViewRoute(route, Middleware.json(schema), sink, project)
      .awaitTermination()
    val v1 = sink.current().get.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v1 == Seq((1L, "one-newer"), (2L, "two")))

    // second tranche + RESTART from the checkpoint: only new envelopes
    // merge; the view keeps its history (asOf) and its exactly-once story
    topics.append(envelopes("v", Seq(
      ("c", """{"k": 3, "v": "three", "ord": 1}""", now),
      ("b", """{"k": 2, "v": "two-stale", "ord": 0}""", now))), "v_origin")
    engine.stopRoute("view-v")
    engine.startViewRoute(route, Middleware.json(schema), sink, project)
      .awaitTermination()
    val v2 = sink.current().get.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // k=2 keeps "two": the stale ord=0 update loses last-write-wins
    assert(v2 == Seq((1L, "one-newer"), (2L, "two"), (3L, "three")))
    assert(engine.metrics.count("view-v.commits") >= 2)
    engine.stopAll()
  }

  test("view route rejects a sink whose queryId is not the route name " +
      "(replay detection would silently break)") {
    val dir = tmpDir("viewroute2")
    val topics = new FileTopicIO(s"$dir/topics")
    val route = StreamRouteConfig("w", "w_origin")
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map("w" -> route)), topics, s"$dir/ckpt")
    val sink = new UpsertSink(spark, s"$dir/state", "k", "ord")
    intercept[IllegalArgumentException] {
      engine.startViewRoute(route, identity, sink, identity)
    }
    engine.stopAll()
  }
}
