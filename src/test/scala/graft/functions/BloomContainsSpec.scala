package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BloomContainsLong: the decontamination prefilter's safety contract is
  * "no false negatives" — a member key must ALWAYS probe true (a false
  * negative would let a contaminated document skip the exact confirm).
  * False positives are allowed (the exact confirm removes them); we assert
  * the configured fpp is roughly honored so the prefilter actually prunes.
  */
class BloomContainsSpec extends SparkSuite {

  test("no false negatives: every inserted key probes true (codegen path)") {
    import spark.implicits._
    val keys = spark.range(0, 5000).select((col("id") * 2654435761L).as("k"))
    val bloom = BloomContains.build(keys)
    val misses = keys
      .filter(!BloomContains.bloomContains(col("k"), bloom))
      .count()
    assert(misses == 0L, s"$misses members probed false — FN is forbidden")
  }

  test("false-positive rate on non-members stays near the configured fpp") {
    val keys = spark.range(0, 5000).select((col("id") * 2654435761L).as("k"))
    val bloom = BloomContains.build(keys, fpp = 0.01)
    // disjoint key space: odd multiples never collide with the even ones
    val nonMembers = spark.range(0, 20000)
      .select((col("id") * 2654435761L + 1L).as("k"))
    val fp = nonMembers
      .filter(BloomContains.bloomContains(col("k"), bloom))
      .count()
    assert(fp < 20000 * 0.05, s"$fp/20000 false positives — filter useless")
  }

  test("interpreted eval agrees with codegen") {
    val bloom = spark.sparkContext.broadcast(BloomContains.build(
      spark.range(0, 100).select(col("id").as("k"))))
    val e = BloomContainsLong(
      org.apache.spark.sql.catalyst.expressions.Literal(42L), bloom)
    assert(e.eval(null) == true)
    val miss = BloomContainsLong(
      org.apache.spark.sql.catalyst.expressions.Literal(-987654321L), bloom)
    // not inserted — overwhelmingly likely false at fpp 0.01
    assert(miss.eval(null) == false)
  }

  test("null key probes null, not false") {
    val bloom = spark.sparkContext.broadcast(BloomContains.build(
      spark.range(0, 10).select(col("id").as("k"))))
    val e = BloomContainsLong(
      org.apache.spark.sql.catalyst.expressions.Literal(
        null, org.apache.spark.sql.types.LongType), bloom)
    assert(e.eval(null) == null)
  }
}
