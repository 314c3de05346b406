package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Analytics routes: a streaming windowed aggregation over a topic whose
  * results land on a sink topic as JSON envelopes — checkpointed and
  * replay-idempotent like every other route. */
class AnalyticsRouteSpec extends SparkSuite {

  test("windowed count per key streams to the sink topic as JSON envelopes") {
    val dir = tmpDir("analytics")
    val topics = new FileTopicIO(s"$dir/topics")
    val engine = new GraftEngine(spark, EngineConfig(), topics, s"$dir/ckpt")

    topics.append(envelopes("m", Seq(
      ("a", "1", ts("2024-01-01 10:00:00")),
      ("a", "2", ts("2024-01-01 10:05:00")),
      ("b", "3", ts("2024-01-01 10:10:00")),
      ("a", "4", ts("2024-01-02 09:00:00")))),
      "metrics_origin")

    engine.startAnalyticsRoute("m", "metrics_origin", "metrics_daily",
      aggregation = df => df
        .withWatermark("timestamp", "1 hour")
        .groupBy(window(col("timestamp"), "1 day").as("w"),
          col("key").cast("string").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("k"), unix_millis(col("w.start")).as("day_ms"), col("n")),
      keyCol = Some("k"),
      trigger = Trigger.AvailableNow()).awaitTermination()

    val out = topics.read(spark, "metrics_daily")
      .select(col("value").cast("string").as("v"))
      .collect().map(_.getString(0)).sorted
    assert(out.length == 3, s"expected 3 (key, day) groups; got ${out.toSeq}")
    assert(out.exists(v => v.contains("\"k\":\"a\"") && v.contains("\"n\":2")))
    assert(out.exists(v => v.contains("\"k\":\"b\"") && v.contains("\"n\":1")))
    assert(out.exists(v => v.contains("\"k\":\"a\"") && v.contains("\"n\":1")))
    assert(engine.metrics.count("m.analytics.batches") >= 1)
  }
}
