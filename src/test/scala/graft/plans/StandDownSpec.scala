package graft.plans

import graft.SparkSuite
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.spark.sql.functions._

/** Stand-down diagnostics: when a join's condition looks like the
  * overlap family but a gate disqualifies the rewrite, the user is left
  * with a silent nested-loop plan — the rule now names the disqualifier
  * once (WARN + PreflightLog, served by /v1/preflight). The round-11
  * re-fixture hit the containsNull case below in production code: only
  * a plan probe revealed why the rewrite had not fired. */
class StandDownSpec extends SparkSuite {

  private def capturing(body: => Unit): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        s"graft-standdown-capture-${System.nanoTime()}",
        null, null, false, null) {
      override def append(e: LogEvent): Unit = buf.synchronized {
        buf += e.getMessage.getFormattedMessage
      }
    }
    appender.start()
    val logger = LogManager.getLogger(classOf[SetOverlapJoinRewrite].getName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prior = logger.getLevel
    logger.addAppender(appender)
    logger.setLevel(Level.WARN)
    try body finally {
      logger.removeAppender(appender)
      logger.setLevel(prior)
      appender.stop()
    }
    buf.toSeq
  }

  private def standDowns(lines: Seq[String]): Seq[String] =
    lines.filter(_.contains("overlap-join rewrite stand-down"))

  test("a containsNull=true gram spelling (transform-then-drop-nulls) is " +
      "diagnosed ONCE per condition — not once per fixed-point iteration " +
      "— naming the null-free respelling, and reaches PreflightLog") {
    val sess = spark
    import sess.implicits._
    SetOverlapJoinRewrite.clearStandDownLog()
    PreflightLog.clear()
    // the exact trap: CASE inside transform makes elements nullable and
    // the trailing is-not-null filter does NOT narrow the TYPE
    def side(n: String) = Seq((1L, "alpha beta c"), (2L, "beta gamma d"))
      .toDF("id", "text")
      .select(col("id").as(s"${n}_id"), expr(
        "filter(transform(split(text, ' '), x -> " +
          "CASE WHEN length(x) > 1 THEN x END), x -> x IS NOT NULL)")
        .as(s"${n}_g"))
    val joined = side("l").join(side("r"),
      size(array_intersect(col("l_g"), col("r_g"))) >= lit(1))
    val lines = capturing { assert(joined.count() >= 2L) }
    val sd = standDowns(lines)
    assert(sd.size == 1,
      s"expected exactly one diagnosis (dedup across optimizer " +
        s"iterations), got ${sd.size}: $sd")
    assert(sd.head.contains("containsNull=true"), sd.head)
    assert(sd.head.contains("pre-filtered positions"), sd.head)
    assert(PreflightLog.recent().exists(
        a => a.line.contains("containsNull=true") && !a.aborted),
      s"stand-down must reach the management surface: ${PreflightLog.recent()}")
  }

  test("a LeftAnti over float-element arrays names the hash-unsafe " +
      "disqualifier (NaN/signed-zero) instead of silently nested-looping") {
    val sess = spark
    import sess.implicits._
    SetOverlapJoinRewrite.clearStandDownLog()
    val left = Seq((1L, Seq(1.5, 2.5)), (2L, Seq(9.0)))
      .toDF("lid", "la")
    val right = Seq((1L, Seq(1.5))).toDF("rid", "ra")
    val lines = capturing {
      assert(left.join(right,
        size(array_intersect(col("la"), col("ra"))) >= lit(1),
        "left_anti").count() == 1L)
    }
    val sd = standDowns(lines)
    assert(sd.nonEmpty, s"expected a diagnosis, got: $lines")
    assert(sd.head.contains("float/double"), sd.head)
  }

  test("joins the rewrite FIRES on, equi-joins, and unrelated theta " +
      "joins stay silent") {
    val sess = spark
    import sess.implicits._
    SetOverlapJoinRewrite.clearStandDownLog()
    val left = Seq((1L, Seq(1L, 2L)), (2L, Seq(9L))).toDF("lid", "la")
    val right = Seq((1L, Seq(1L))).toDF("rid", "ra")
    val lines = capturing {
      // fires: clean long-element overlap
      assert(left.join(right,
        arrays_overlap(col("la"), col("ra"))).count() == 1L)
      // unrelated theta join: no overlap shape anywhere
      assert(left.join(right, col("lid") > col("rid")).count() == 1L)
      // equi-join alongside an overlap conjunct: already O(collisions)
      assert(left.join(right, col("lid") === col("rid")
        && arrays_overlap(col("la"), col("ra"))).count() == 1L)
    }
    assert(standDowns(lines).isEmpty,
      s"no stand-down fired here, nothing to diagnose: ${standDowns(lines)}")
  }
}
