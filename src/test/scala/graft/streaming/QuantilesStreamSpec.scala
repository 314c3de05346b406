package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pipeline.streamingQuantiles: one KLL sketch per group in the state
  * store, cumulative across micro-batches; the latest emission's
  * quantiles sit within the sketch's rank-error bound of the exact
  * quantiles over ALL values seen so far; state stays one row per group.
  * MemoryStream-driven. */
class QuantilesStreamSpec extends SparkSuite {

  test("cross-batch merge: quantiles after batch 2 reflect batch 1's " +
      "values too, within rank-error bound; one state row per group") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val out = Pipeline.streamingQuantiles("_1", "_2")(in.toDF())
    val name = s"kllstream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: values 0..4999; batch 2: values 5000..9999 — after both,
      // the union is 0..9999 and exact p50 = 5000, p90 = 9000
      in.addData((0 until 5000).map(i => ("g", i.toDouble)): _*)
      q.processAllAvailable()
      val afterB1 = spark.table(name).filter("group = 'g'")
        .orderBy($"n_seen".desc).head()
      assert(afterB1.getLong(1) == 5000L)
      assert(math.abs(afterB1.getDouble(2) - 2500.0) <= 150.0,
        s"batch-1 p50 ${afterB1.getDouble(2)}")
      in.addData((5000 until 10000).map(i => ("g", i.toDouble)): _*)
      q.processAllAvailable()
      val r = spark.table(name).filter("group = 'g'")
        .orderBy($"n_seen".desc).head()
      assert(r.getLong(1) == 10000L, "sketch must accumulate across batches")
      val eps = 0.02 * 10000
      assert(math.abs(r.getDouble(2) - 5000.0) <= eps, s"p50 ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - 9000.0) <= eps, s"p90 ${r.getDouble(3)}")
      val p = q.lastProgress
      assert(p.stateOperators(0).numRowsTotal == 1L,
        s"one sketch row expected, got ${p.stateOperators(0).numRowsTotal}")
    } finally q.stop()
  }
}
