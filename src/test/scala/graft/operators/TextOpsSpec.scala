package graft.operators

import graft.SparkSuite

/** Boilerplate-scrub semantics on a constructed corpus: the repeated
  * segment disappears from every document, unique segments survive in
  * original order, and counts are exact. */
class TextOpsSpec extends SparkSuite {

  test("boilerplate chunks are removed everywhere; unique text survives " +
      "in order; counts are exact") {
    val sess = spark
    import sess.implicits._
    // 2-word chunks; "subscribe now" appears in 3 docs → boilerplate at
    // minDf=3; "one two" appears in 2 docs → kept
    val docs = Seq(
      (1L, "alpha beta subscribe now gamma delta"),
      (2L, "one two subscribe now"),
      (3L, "subscribe now epsilon zeta one two"),
      (4L, "plain text with no repeats at all")
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateScrub(docs, chunkWords = 2, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, "one two")))
    assert(out(3L) == ((3L, 1L, "epsilon zeta one two")))
    assert(out(4L) == ((4L, 0L, "plain text with no repeats at all")))
  }

  test("a document that is pure boilerplate scrubs to the empty string") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, "all rights reserved"),
      (2L, "all rights reserved"),
      (3L, "all rights reserved"),
      (4L, "actual content here")
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateScrub(docs, chunkWords = 3, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out(4L) == "actual content here")
  }
}
