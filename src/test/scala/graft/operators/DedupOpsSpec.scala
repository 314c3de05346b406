package graft.operators

import graft.SparkSuite

/** The hot-shingle frequency cap: one boilerplate shingle shared by every
  * document must not quadratic-blow the candidate pair count. */
class DedupOpsSpec extends SparkSuite {

  private def docs = {
    val sess = spark
    import sess.implicits._
    // 6 unrelated docs all ending with the same boilerplate 3-gram tail,
    // plus one true near-dup pair (100/101) sharing most of their text
    val boiler = "all rights reserved"
    val unrelated = (1 to 6).map(i =>
      (i.toLong, s"unique$i text$i body$i words$i here$i $boiler", "en"))
    val dupA = (100L, "the quick brown fox jumps over the lazy dog", "en")
    val dupB = (101L, "the quick brown fox jumps over the lazy cat", "en")
    (unrelated :+ dupA :+ dupB).toDF("doc_id", "text", "lang")
  }

  test("minhash sigs are idempotent over duplicate shingles: the sig " +
      "branches (d03/d15 bands, p01) build shingle strings WITHOUT " +
      "array_distinct — the 16 family minimums must not change if a " +
      "shingle repeats (the distinct was half the stage's CPU)") {
    val sess = spark
    import org.apache.spark.sql.functions._
    import sess.implicits._
    // tiny vocab → heavy repeated trigrams per doc
    val rnd = new scala.util.Random(3L)
    val vocab = Vector("a", "b", "c")
    val dup = (1 to 60).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin))
    val mismatches = dup
      .withColumn("a", graft.functions.MinHashSig.minhashSigs(col("sh")))
      .withColumn("b", graft.functions.MinHashSig.minhashSigs(
        array_distinct(col("sh"))))
      .filter(expr("a <> b")).count()
    assert(mismatches == 0L)
    // and at least one fixture doc actually HAS duplicate shingles, so
    // the assertion is not vacuous
    assert(dup.filter(size(col("sh")) > size(array_distinct(col("sh"))))
      .count() > 0)
  }

  test("uncapped: the boilerplate shingle manufactures cross-doc candidate " +
      "pairs; capped: only genuinely similar docs remain candidates") {
    val uncapped = DedupOps.ngramCandidates(docs, None).collect()
    // 6 boilerplate docs → C(6,2)=15 pairs from one shingle + the dup pair
    assert(uncapped.length == 16, s"got ${uncapped.length}")

    val capped = DedupOps.ngramCandidates(docs, Some(2)).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)),
      "cap ≤2 must drop the 6-doc boilerplate shingle and keep the dup pair")
  }

  test("expandPairs headroom at the hot-shingle cap: a single k=2000 group " +
      "(the pathological pre-cap skew shape) expands C(k,2) ≈ 2M pairs " +
      "through the native sorted_pairs generator in bounded time") {
    import org.apache.spark.sql.functions._
    // one group whose ids array is at a production-scale cap — the worst
    // single-task unit the maxShingleFreq cap admits
    val grouped = spark.range(1).select(expr("sequence(0L, 1999L)").as("ids"))
    val cold0 = System.nanoTime()
    val n = DedupOps.expandPairs(grouped).count()
    val cold = (System.nanoTime() - cold0) / 1e9
    val warm0 = System.nanoTime()
    DedupOps.expandPairs(grouped).count()
    val sec = (System.nanoTime() - warm0) / 1e9
    assert(n == 2000L * 1999 / 2, s"got $n")
    info(f"expandPairs k=2000 (1,999,000 pairs): cold $cold%.2f s, warm $sec%.2f s")
    // loose wall bound: catches an accidental O(k^3) or per-pair JVM-object
    // regression, not a tuning target (the interpreted HOF predecessor
    // measured ~1 s warm here; the generator is far under)
    assert(sec < 60.0, f"expandPairs took $sec%.1f s for one k=2000 group")
  }

  test("sorted_pairs ≡ the HOF pair expansion it replaced: identical row " +
      "multisets on seeded random groups incl. empty, singleton, and " +
      "duplicate-id arrays; SQL registration works") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(90210)
    val groups = (1 to 200).map { _ =>
      val k = rnd.nextInt(8) // 0..7, empties and singletons frequent
      val base = Seq.fill(k)(rnd.nextInt(10).toLong).sorted
      // inject occasional duplicate ids — the HOF emitted (x, x) pairs for
      // them and the generator must match that multiset exactly
      base
    }
    val sess = spark
    import sess.implicits._
    val df = groups.toDF("ids")
    val hof = df
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |    y -> struct(x AS a_id, y AS b_id))))""".stripMargin)).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val gen = DedupOps.expandPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(gen.toSeq == hof.toSeq,
      s"generator emitted ${gen.length} pairs, HOF ${hof.length}")
    // null array emits nothing, like the HOF's explode-of-null
    val withNull = spark.sql("SELECT sorted_pairs(CAST(NULL AS ARRAY<BIGINT>))")
    assert(withNull.count() == 0)
    // null ELEMENTS are skipped (documented contract for direct SQL
    // callers — never a silent 0 read through the primitive accessor)
    val nullElems = spark.sql(
      "SELECT * FROM (SELECT sorted_pairs(array(1L, NULL, 3L, NULL, 7L)))")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(nullElems.toSeq == Seq((1L, 3L), (1L, 7L), (3L, 7L)))
    // SQL-registered entry point agrees on a literal group
    val sqlRows = spark.sql(
      "SELECT * FROM (SELECT sorted_pairs(array(1L, 2L, 3L)))")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(sqlRows.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("crossDocSpans merges consecutive matching grams into maximal " +
      "spans per (pair, diagonal): two shared passages → two spans with " +
      "exact word lengths") {
    val sess = spark
    import sess.implicits._
    val span1 = (1 to 15).map(i => s"s$i").mkString(" ")  // 15 shared words
    val span2 = (1 to 12).map(i => s"u$i").mkString(" ")  // 12 shared words
    val d = Seq(
      (1L, s"a1 a2 a3 a4 a5 $span1 a6 a7 a8 a9 a10 $span2 a11", "en"),
      (2L, s"b1 b2 b3 $span1 b4 $span2 b5 b6 b7 b8", "en"),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    val got = DedupOps.crossDocSpans(d).collect()
    assert(got.length == 1, s"expected one pair, got ${got.toSeq}")
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getAs[Long]("n_spans") == 2L, s"got $r")
    assert(r.getAs[Long]("max_span_words") == 15L, s"got $r")
    assert(r.getAs[Long]("dup_words") == 27L, s"got $r")
  }

  test("scrubCrossDocSpans removes the LATER doc's copy of a shared span " +
      "and keeps the first occurrence intact (exact positions, exact md5)") {
    val sess = spark
    import sess.implicits._
    val span = (1 to 15).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, s"a1 a2 a3 $span a4 a5", "en"),
      (2L, s"b1 b2 $span b3", "en"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "en")
    ).toDF("doc_id", "text", "lang")
    val got = DedupOps.scrubCrossDocSpans(d).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_removed_words"), r.getAs[String]("clean_md5")))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 is the first occurrence → untouched; doc 2 loses exactly the
    // 15 span words; doc 3 never matched → untouched
    assert(got.toSeq == Seq(
      (1L, 20L, 0L, md5(s"a1 a2 a3 $span a4 a5")),
      (2L, 18L, 15L, md5("b1 b2 b3")),
      (3L, 9L, 0L, md5("c1 c2 c3 c4 c5 c6 c7 c8 c9"))), s"got ${got.toSeq}")
  }

  test("incrementalSpanScrub scrubs incoming docs against the corpus only: " +
      "corpus text is untouched, batch-internal duplication is ignored") {
    val sess = spark
    import sess.implicits._
    val span = (1 to 15).map(i => s"s$i").mkString(" ")
    val dup = (1 to 15).map(i => s"d$i").mkString(" ")
    val corpus = Seq(
      (1L, s"a1 a2 $span a3", "en"),
      (2L, (1 to 20).map(i => s"b$i").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    // docs 10/11 share `dup` with EACH OTHER (not the corpus): must be kept
    val incoming = Seq(
      (10L, s"x1 $span x2 $dup x3", "en"),
      (11L, s"y1 y2 $dup y3", "en")
    ).toDF("doc_id", "text", "lang")
    val got = DedupOps.incrementalSpanScrub(corpus, incoming).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_removed_words"), r.getAs[String]("clean_md5")))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      // doc 10 loses exactly the corpus span; its batch-internal dup stays
      (10L, 33L, 15L, md5(s"x1 x2 $dup x3")),
      // doc 11 matches nothing in the corpus → untouched
      (11L, 18L, 0L, md5(s"y1 y2 $dup y3"))), s"got ${got.toSeq}")
  }

  test("crossDocSpans hot-gram cap: a boilerplate passage shared by many " +
      "docs must not quadratic-blow the pair expansion") {
    val sess = spark
    import sess.implicits._
    val boiler = "the same legal boilerplate footer appears verbatim in " +
      "every mirrored page today"  // 12 words → one maximal span ≥ minSpan
    val flood = (1 to 10).map(i => (i.toLong, s"f${i}a f${i}b $boiler f${i}c", "en"))
    val span = (1 to 15).map(i => s"s$i").mkString(" ")
    val d = (flood ++ Seq((100L, s"x1 x2 $span x3", "en"),
      (101L, s"y1 $span y2 y3", "en"))).toDF("doc_id", "text", "lang")
    // uncapped: C(10,2)=45 boilerplate pairs + the genuine pair
    assert(DedupOps.crossDocSpans(d).count() == 46L)
    // capped: every boilerplate gram occurs 10× > 4 → dropped pre-expansion
    val capped = DedupOps.crossDocSpans(d, maxGramFreq = Some(4)).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 101L)), s"got ${capped.toSeq}")
  }

  test("band-bucket cap: a flood of identical documents must not " +
      "quadratic-blow one LSH bucket's pair expansion") {
    val sess = spark
    import sess.implicits._
    // 30 byte-identical docs (one band bucket of 30 per band) + a true
    // near-dup pair — the flood alone would emit C(30,2)=435 pairs
    val flood = (1 to 30).map(i =>
      (i.toLong, "same exact boilerplate text repeated in every mirror copy",
        "en"))
    val dupA = (100L, "the quick brown fox jumps over the lazy dog", "en")
    val dupB = (101L, "the quick brown fox jumps over the lazy dog", "en")
    val d = (flood :+ dupA :+ dupB).toDF("doc_id", "text", "lang")
    val uncapped = DedupOps.minhashLshPairs(d, None).count()
    assert(uncapped >= 435L, s"got $uncapped")
    val capped = DedupOps.minhashLshPairs(d, Some(10)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      "cap ≤10 must drop the 30-doc bucket and keep the genuine near-dup")
  }

  test("connected components converge on a deep chain in O(log diameter) " +
      "rounds (pointer doubling), not O(diameter)") {
    val sess = spark
    import sess.implicits._
    // a 61-vertex path: plain min-label propagation needs 60 rounds; with
    // the shortcut it must finish well inside 12
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comps = DedupOps.connectedComponents(chain, maxRounds = 12).collect()
    assert(comps.length == 61 && comps.forall(_.getLong(1) == 0L))
    // and two disjoint chains keep distinct component labels
    val two = ((0L until 10L).map(i => (i, i + 1)) ++
      (100L until 110L).map(i => (i, i + 1))).toDF("a_id", "b_id")
    val byComp = DedupOps.connectedComponents(two, maxRounds = 10).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byComp == Map(0L -> 11, 100L -> 11))
  }

  test("reliable-checkpoint mode produces identical components to " +
      "localCheckpoint mode (preemptible-cluster path)") {
    val sess = spark
    import sess.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    try {
      val edges = ((0L until 20L).map(i => (i, i + 1)) ++
        Seq((50L, 51L), (51L, 52L))).toDF("a_id", "b_id")
      val local = DedupOps.connectedComponents(edges, maxRounds = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reliable = DedupOps.connectedComponents(edges, maxRounds = 10,
          reliableCheckpointDir = Some(ckpt.toString))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == reliable)
      // reliable mode actually wrote RDD checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(ckpt).count() > 1
      assert(wrote, "no checkpoint data written to the reliable dir")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("the Jaccard cut output is unchanged by the cap on this corpus " +
      "(boilerplate-only pairs never pass the threshold)") {
    val off = DedupOps.ngramJaccard(docs, None).collect().toSeq
    val on = DedupOps.ngramJaccard(docs, Some(2)).collect().toSeq
    assert(off == on)
    assert(off.map(r => (r.getLong(0), r.getLong(1))) == Seq((100L, 101L)))
  }

  test("repeatedSpans: cross-doc spans merge into runs; within-doc-only " +
      "repetition and unique text never flag") {
    val sess = spark
    import sess.implicits._
    // docs 1+2 share the 4-word run "red green blue cyan" (two overlapping
    // 3-grams → one span of length 2); doc 3 repeats its own 3-gram but
    // shares nothing cross-doc; doc 4 is unique
    val docs = Seq(
      (1L, "aa red green blue cyan bb cc"),
      (2L, "xx yy red green blue cyan zz"),
      (3L, "one two three one two three"),
      (4L, "totally unique words only here")
    ).toDF("doc_id", "text")
    val out = DedupOps.repeatedSpans(docs, gramWords = 3, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    // doc 1: 5 grams, positions 1,2 duplicated → run of 2
    assert(out(1L) == ((5L, 2L, 2L)))
    // doc 2: 5 grams, positions 2,3 duplicated → run of 2
    assert(out(2L) == ((5L, 2L, 2L)))
    // doc 3: within-doc repetition only → docFreq counts ONE distinct doc
    assert(out(3L) == ((4L, 0L, 0L)))
    assert(out(4L) == ((3L, 0L, 0L)))
  }
}
