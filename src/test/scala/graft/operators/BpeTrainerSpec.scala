package graft.operators

import graft.SparkSuite
import graft.operators.BpeTrainer.Merge

/** BPE trainer: hand-computed merges on the classic 4-word example, a
  * differential check against a naive in-memory BPE on real corpus words,
  * and segmentation round-trip. */
class BpeTrainerSpec extends SparkSuite {

  private def vocabDf(v: Seq[(String, Long)]) = {
    val sess = spark
    import sess.implicits._
    v.toDF("word", "freq")
  }

  test("classic example: merge order and counts are the textbook sequence") {
    // low:5 lower:2 newest:6 widest:3 (no end-of-word marker)
    val wf = vocabDf(Seq("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L))
    val merges = BpeTrainer.train(wf, 4)
    // e-s and s-t tie at 9 → lexicographic (l, r) picks (e, s) first;
    // l-o and o-w tie at 7 → (l, o) first, and after fusing, (lo, w).
    assert(merges == Seq(
      Merge("e", "s", 9L),
      Merge("es", "t", 9L),
      Merge("l", "o", 7L),
      Merge("lo", "w", 7L)))
  }

  test("an empty word is DROPPED, not expanded to two empty symbols: " +
      "Spark's sequence(1, 0) counts DOWN to [1, 0], so an unfiltered " +
      "empty word produced syms = [\"\", \"\"] — a phantom (\"\",\"\") " +
      "pair whose weight could win the argmax and corrupt the vocabulary") {
    val wf = vocabDf(Seq("" -> 1000L, "low" -> 5L, "lower" -> 2L))
    val merges = BpeTrainer.train(wf, 2)
    assert(merges.forall(m => m.left.nonEmpty && m.right.nonEmpty),
      s"no empty-string merges allowed: $merges")
    assert(merges.head == Merge("l", "o", 7L), merges)
    // segment() applies the same guard — the empty word just disappears
    val seg = BpeTrainer.segment(wf, merges).collect()
    assert(!seg.exists(_.getAs[String]("word").isEmpty))
  }

  test("segment applies trained merges in order") {
    val wf = vocabDf(Seq("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L))
    val merges = BpeTrainer.train(wf, 4)
    val seg = BpeTrainer.segment(wf, merges).collect()
      .map(r => r.getAs[String]("word") ->
        r.getSeq[String](r.fieldIndex("syms")).toList).toMap
    assert(seg("low") == List("low"))
    assert(seg("lower") == List("low", "e", "r"))
    assert(seg("newest") == List("n", "e", "w", "est"))
    assert(seg("widest") == List("w", "i", "d", "est"))
  }

  /** Naive reference: exact same semantics, driver-side Maps. */
  private def naiveBpe(vocab: Map[String, Long], n: Int): Seq[Merge] = {
    var words: Map[List[String], Long] =
      vocab.groupMapReduce(_._1.map(_.toString).toList)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (c < 2) done = true
        else {
          out += Merge(l, r, c)
          words = words.groupMapReduce { case (syms, _) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            syms.foreach { s =>
              if (b.nonEmpty && b.last == l && s == r) {
                b.remove(b.size - 1); b += (l + r)
              } else b += s
            }
            b.toList
          }(_._2)(_ + _)
          i += 1
        }
      }
    }
    out.toSeq
  }

  test("property: trainer matches the naive reference on random vocabularies") {
    // scalacheck engine directly (no scalatestplus bridge in this build) —
    // random small vocabularies over a 4-letter alphabet provoke the nasty
    // cases (overlapping pairs "aaa", multi-occurrence words, ties).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val wordGen = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val vocabGen = for {
      n <- Gen.choose(2, 10)
      ws <- Gen.listOfN(n, wordGen)
      fs <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ws.zip(fs).groupMapReduce(_._1)(_._2)(_ + _)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(vocabGen) { vocab =>
        val wf = vocabDf(vocab.toSeq)
        BpeTrainer.train(wf, 5) == naiveBpe(vocab, 5)
      })
    assert(res.passed, res.status.toString)
  }

  test("differential vs naive in-memory BPE on real corpus words") {
    val docs = graft.Tables(spark, sf0001).documents.limit(40)
    val wf = BpeTrainer.wordFrequencies(docs)
    val vocab = wf.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("freq")).toMap
    val expected = naiveBpe(vocab, 8)
    val got = BpeTrainer.train(wf, 8)
    assert(got == expected,
      s"trainer diverged from reference:\n got=$got\n exp=$expected")
  }
}
