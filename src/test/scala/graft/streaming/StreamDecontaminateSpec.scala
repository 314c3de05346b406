package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pipeline.streamingDecontaminate: the stateless stream twin of the
  * batch bloom + exact-confirm decontamination — marks must equal exact
  * set membership per arriving document, across micro-batches, even
  * when the bloom prefilter is deliberately built at a false-positive
  * rate high enough that prefilter-only marking would be wrong. */
class StreamDecontaminateSpec extends SparkSuite {

  test("marks equal exact banned-gram membership across micro-batches; " +
      "a high-fpp bloom cannot mark a clean document (the exact confirm " +
      "decides); the operator stays stateless (append mode, no state " +
      "rows)") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // banned universe: 400 keys; fpp 0.3 makes prefilter-only marking
    // collide with clean docs virtually surely across 600 clean probes
    val banned = Seq.fill(400)(rnd.nextLong()).distinct
    val bannedDf = banned.toDF("g")
    val bloom = graft.functions.BloomContains.build(bannedDf, fpp = 0.3)
    val cleanPool = Seq.fill(600)(rnd.nextLong()).filterNot(banned.contains)
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloom))
    val fpExists = cleanPool.exists(bf.mightContainLong)
    val src = MemoryStream[DecontamDoc]
    val q = Pipeline.streamingDecontaminate("gh", bannedDf)(src.toDF())
      .select("did", "contaminated")
      .writeStream.format("memory").queryName("decontam_twin")
      .outputMode("append").start()
    try {
      def docs(seed: Int, n: Int): Seq[DecontamDoc] = {
        val r = new scala.util.Random(seed)
        (0 until n).map { i =>
          val grams = Seq.fill(r.nextInt(6))(
            if (r.nextInt(100) < 30) banned(r.nextInt(banned.size))
            else cleanPool(r.nextInt(cleanPool.size)))
          DecontamDoc(seed * 1000L + i, grams)
        }
      }
      val b1 = docs(1, 40); val b2 = docs(2, 40)
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("decontam_twin").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val all = b1 ++ b2
      assert(got.size == all.size)
      all.foreach { d =>
        val want = d.gh.exists(banned.contains)
        assert(got(d.did) == want,
          s"doc ${d.did}: got ${got(d.did)}, want $want (grams ${d.gh})")
      }
      assert(all.exists(d => !d.gh.exists(banned.contains)),
        "fixture must include clean docs")
      assert(all.exists(d => d.gh.exists(banned.contains)),
        "fixture must include contaminated docs")
      assert(q.lastProgress == null
        || q.lastProgress.stateOperators.isEmpty,
        "decontamination must add no stateful operators")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS decontam_twin")
    }
    // the high-fpp claim is only meaningful if the bloom actually fires
    // on some clean gram — seeded, so this is a deterministic check
    assert(fpExists, "fixture self-check: fpp 0.3 over 600 clean probes " +
      "must produce at least one bloom false positive")
  }
}

/** Top-level so Spark's encoder codegen works (nested suite case
  * classes fall back to interpreted projections). */
case class DecontamDoc(did: Long, gh: Seq[Long])
