package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected optimizer guardrail: unpartitioned windows fail at planning
  * when the conf is on, pass when off (default), and partitioned windows
  * are never touched. */
class ScaleGuardsSpec extends SparkSuite {

  private def withGuard[A](on: Boolean)(f: => A): A = {
    spark.conf.set(ScaleGuards.FailUnpartitionedWindowsKey, on.toString)
    try f
    finally spark.conf.unset(ScaleGuards.FailUnpartitionedWindowsKey)
  }

  test("guard ON: an unpartitioned window fails at planning time") {
    val df = spark.range(100)
      .withColumn("rk", row_number().over(Window.orderBy(col("id"))))
    val e = intercept[Exception](withGuard(on = true)(df.collect()))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unpartitioned window")),
      s"wrong failure: $e")
  }

  test("guard ON: partitioned windows plan and run normally") {
    val df = spark.range(100)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id") % 10).orderBy(col("id"))))
    assert(withGuard(on = true)(df.count()) == 100)
  }

  test("guard OFF (default): unpartitioned windows still run") {
    val df = spark.range(100)
      .withColumn("rk", row_number().over(Window.orderBy(col("id"))))
    assert(df.count() == 100)
  }

  test("guard ON: a global aggregate (no window function) is not flagged") {
    assert(withGuard(on = true)(
      spark.range(100).agg(sum(col("id"))).collect()).length == 1)
  }

  private def withCartesianGuard[A](on: Boolean)(f: => A): A = {
    spark.conf.set(ScaleGuards.FailCartesianProductsKey, on.toString)
    try f
    finally spark.conf.unset(ScaleGuards.FailCartesianProductsKey)
  }

  test("cartesian guard ON: a condition-less inner join fails at planning") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val e = intercept[Exception](
      withCartesianGuard(on = true)(a.crossJoin(b).collect()))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("cartesian")), s"wrong failure: $e")
  }

  test("cartesian guard ON: an equi-join (even spelled as a filter above " +
      "the join) is not flagged — pushdown runs before the guard") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val joined = withCartesianGuard(on = true)(
      a.join(b, col("x") === col("y")).count())
    assert(joined == 100)
  }

  test("cartesian guard OFF (default): cross joins still run") {
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    assert(a.crossJoin(b).count() == 100)
  }
}
