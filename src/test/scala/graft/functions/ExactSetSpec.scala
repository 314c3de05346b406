package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SortedLongSetContains + ExactSetContains.build: exact membership
  * (binary search over the driver-collected sorted distinct keys),
  * null propagation, codegen path, and the loud over-cap guard. */
class ExactSetSpec extends SparkSuite {

  test("membership is exact over random key sets — including boundary " +
      "keys, misses between neighbors, and Long.Min/Max") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(7)
    val keys = (Seq.fill(500)(rnd.nextLong())
      ++ Seq(Long.MinValue, Long.MaxValue, 0L)).distinct
    val arr = ExactSetContains.build(keys.toDF("k"))
    assert(arr.length == keys.size && arr.sameElements(arr.sorted))
    val probes = keys.take(50) ++ Seq.fill(50)(rnd.nextLong())
    val got = probes.toDF("p")
      .select(col("p"),
        ExactSetContains.sortedSetContains(col("p"), arr).as("m"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    probes.foreach { p =>
      assert(got(p) == keys.contains(p), s"probe $p")
    }
  }

  test("null probes stay null; the builder drops null keys and " +
      "deduplicates") {
    val sess = spark
    import sess.implicits._
    val arr = ExactSetContains.build(
      Seq[java.lang.Long](5L, 5L, null, 9L).toDF("k"))
    assert(arr.toSeq == Seq(5L, 9L))
    val out = Seq[java.lang.Long](5L, null, 6L).toDF("p")
      .select(ExactSetContains.sortedSetContains(col("p"), arr).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq == Seq(Some(true), None, Some(false)))
  }

  test("the over-cap guard throws loudly (no silent truncation) and " +
      "names the fallback") {
    val sess = spark
    import sess.implicits._
    val e = intercept[IllegalArgumentException] {
      ExactSetContains.build((1L to 100L).toDF("k"), maxKeys = 10)
    }
    assert(e.getMessage.contains("p08"), e.getMessage)
  }

  test("the cap guard counts the COLLECTED set, not the raw column: raw " +
      "values that collapse under cast-to-long (duplicates-modulo-parse, " +
      "non-numeric → null) must not spuriously reject a probe set whose " +
      "real array fits") {
    val sess = spark
    import sess.implicits._
    // 5 raw distinct strings → 3 distinct longs ("07" ≡ "7", "009" ≡ "9")
    val keys = Seq("7", "07", "8", "9", "009").toDF("k")
    val arr = ExactSetContains.build(keys, maxKeys = 3)
    assert(arr.toSeq == Seq(7L, 8L, 9L))
  }

  test("the expression serializes WITHOUT the key array — only the " +
      "broadcast handle rides the task binary (same for the bloom bytes)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def serializedSize(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    // 1M keys = 8 MB raw; the serialized expression must stay tiny
    val keys = (1L to 1000000L).toArray
    val kBc = spark.sparkContext.broadcast(keys)
    val e = SortedLongSetContains(Literal(5L), kBc)
    val n = serializedSize(e)
    assert(n < 64 * 1024,
      s"expression serialized to $n bytes — the key array is riding " +
        "the task binary instead of the broadcast")
    // bloom twin: 1 MB of filter bytes must not be embedded either
    val bBc = spark.sparkContext.broadcast(Array.fill[Byte](1 << 20)(1))
    val b = BloomContainsLong(Literal(5L), bBc)
    val nb = serializedSize(b)
    assert(nb < 64 * 1024, s"bloom expression serialized to $nb bytes")
    // and the broadcast value still evaluates correctly end-to-end
    val sess = spark
    import sess.implicits._
    val got = Seq(5L, -1L).toDF("p")
      .select(ExactSetContains.sortedSetContains(col("p"), kBc).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
    kBc.destroy(); bBc.destroy()
  }

  test("buildBoth returns both structures from the same collected keys: " +
      "exact array matches build(), bloom has no false negatives") {
    val sess = spark
    import sess.implicits._
    val keys = Seq(3L, 1L, 2L, 3L)
    val (exactBc, bloomBc) = ExactSetContains.buildBoth(keys.toDF("k"))
    assert(exactBc.value.toSeq == Seq(1L, 2L, 3L))
    val marked = Seq(1L, 2L, 3L).toDF("p")
      .select(BloomContains.bloomContains(col("p"), bloomBc).as("m"))
      .collect().map(_.getBoolean(0))
    assert(marked.forall(identity), "bloom must contain every built key")
    exactBc.destroy(); bloomBc.destroy()
  }

  test("composes inside exists() over a gram-hash array with " +
      "whole-stage codegen (the p21/streaming-decontaminate shape)") {
    val sess = spark
    import sess.implicits._
    val arr = ExactSetContains.build(Seq(100L, 200L).toDF("k"))
    val df = Seq(
      (1L, Seq(1L, 100L)), (2L, Seq(2L, 3L)), (3L, Seq[Long]()))
      .toDF("id", "gh")
      .select(col("id"), exists(col("gh"),
        g => ExactSetContains.sortedSetContains(g, arr)).as("hit"))
    assert(df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      .sortBy(_._1) == Seq((1L, true), (2L, false), (3L, false)))
  }
}
