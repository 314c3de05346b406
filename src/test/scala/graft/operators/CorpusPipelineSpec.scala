package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit-level semantics of the mixture library function (the p03 oracle
  * gates the aggregate view; this pins per-document copy behavior). */
class CorpusPipelineSpec extends SparkSuite {

  test("mixtureEpochs: integer epochs repeat exactly; fractional epochs " +
      "choose a deterministic content-hash subset; sub-unit weights drop " +
      "deterministically; unlisted sources default to one epoch") {
    val sess = spark
    import sess.implicits._
    val docs = (1 to 200).map(i =>
      (i.toLong, s"doc body number $i with some words", "src" + (i % 4)))
      .toDF("doc_id", "text", "source")
    val weights = Seq(("src0", 2000), ("src1", 2500), ("src2", 0))
      .toDF("source", "w_permille")
    val mixed = CorpusPipeline.mixtureEpochs(docs, weights).cache()

    // src0 (2.0 epochs): every doc exactly twice
    val src0 = mixed.filter(col("source") === "src0")
      .groupBy(col("doc_id")).count().collect()
    assert(src0.nonEmpty && src0.forall(_.getLong(1) == 2L))
    // src1 (2.5): every doc 2 or 3 times; realized mean strictly between
    val src1 = mixed.filter(col("source") === "src1")
      .groupBy(col("doc_id")).count().collect()
    assert(src1.forall(r => r.getLong(1) == 2L || r.getLong(1) == 3L))
    // src2 (0.0): dropped entirely
    assert(mixed.filter(col("source") === "src2").count() == 0)
    // src3 (unlisted → 1000): exactly once
    val src3 = mixed.filter(col("source") === "src3")
      .groupBy(col("doc_id")).count().collect()
    assert(src3.nonEmpty && src3.forall(_.getLong(1) == 1L))
    // deterministic: a second run yields the identical multiset
    val again = CorpusPipeline.mixtureEpochs(docs, weights)
      .groupBy(col("doc_id")).count()
    val first = mixed.groupBy(col("doc_id")).count()
    assert(again.exceptAll(first).count() == 0
      && first.exceptAll(again).count() == 0)
  }
}
