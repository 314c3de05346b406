package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The typed Aggregator sketch must produce bit-identical signatures to the
  * expression-based pipeline (d03 / oracle). */
class MinHashAggSpec extends SparkSuite {

  test("typed MinHash aggregator equals the expression-based signature") {
    val sess = spark
    import sess.implicits._
    val docs = Tables(spark, sf0001).documents
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh_arr", array_distinct(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin)))
      .select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
      .filter(col("doc_id") < 20)

    // expression-based: the ACTUAL d03 form — minhash_sigs
    // ((a_i·x + b_i) mod p over the 28-bit md5 prefix) on the gathered
    // shingle set. An earlier revision of this spec compared against a
    // stale h60("i:"+shingle) spelling d03 no longer uses, which let
    // the aggregator drift to a hash family whose signatures could
    // never band-join against d03's.
    val exprSig = docs.groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("sh"))
      .select(col("doc_id"), MinHashSig.minhashSigs(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    // typed Aggregator
    val agg = new MinHashAgg(16)
    val typedSig = docs.as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().map { case (id, sig) => id -> sig.toVector }.toMap

    assert(typedSig.keySet == exprSig.keySet)
    typedSig.foreach { case (id, sig) => assert(sig == exprSig(id), s"doc $id") }
  }

  test("a global aggregate over ZERO rows yields NULL, not the " +
      "all-MaxValue zero buffer: that sentinel is a 'signature' no real " +
      "input can produce, and two empty inputs band-joined as perfect " +
      "near-duplicates (MinHashSig's null-for-empty contract)") {
    val sess = spark
    import sess.implicits._
    val agg = new MinHashAgg(16)
    val empty = sess.emptyDataset[String]
    val out = empty.select(agg.toColumn.name("sig")).collect()
    assert(out.length == 1 && out(0) == null,
      s"empty input must aggregate to null, got ${out.toSeq}")
    // one row updates EVERY slot, so any non-empty input is non-null
    val one = Seq("shingle").toDS().select(agg.toColumn.name("sig"))
      .collect()
    assert(one(0) != null && one(0).length == 16)
  }

  test("h60Jvm matches the SQL h60 expression") {
    val sess = spark
    import sess.implicits._
    val inputs = Seq("abc", "0:the quick fox", "é中文")
    val fromSql = inputs.toDF("s").select(StableHash.h60(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(fromSql == inputs.map(StableHash.h60Jvm))
  }
}
