package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSuite {

  test("salted join returns exactly the unsalted join's rows") {
    val li = Tables(spark, sf0001).lineitem
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf0001).orders
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = SkewTools.saltedJoin(li, o, "l_orderkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted aggregation equals direct groupBy sum/count") {
    val li = Tables(spark, sf0001).lineitem
    val direct = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"), count(lit(1)).as("n"))
    val salted = SkewTools.saltedSumCount(li, "l_suppkey", "l_quantity", 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("GraftSession builder exposes the hamming64 extension in SQL") {
    // the shared test session may predate the extension; build verifies conf
    val s = graft.GraftSession.build("graft-skew-test", "local[2]", 2)
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
