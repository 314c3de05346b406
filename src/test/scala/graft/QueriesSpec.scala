package graft

import graft.streaming.MediaPipeline

/** Registry-level checks: the driver contract holds and every declared
  * query runs at sf0.001 with sane output. (The value-level gate is the
  * DuckDB oracle — tools/oracle_check.py — run via graft.Verify.) */
class QueriesSpec extends SparkSuite {

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_._1)
    assert(names.distinct.size == names.size)
  }

  test("every declared query executes at sf0.001 and returns rows") {
    val empties = SparkEntry.registry.filter { case (name, d) =>
      d.build(spark, sf0001).count() == 0
    }.map(_._1)
    // d02/d03/d05: near-dup pairs can legitimately be absent at tiny SF —
    // all other queries must be non-empty
    assert(empties.forall(n =>
      n.startsWith("d02") || n.startsWith("d03") || n.startsWith("d05")),
      s"unexpected empty results: $empties")
  }

  test("q43 batch sessionization agrees with a03's session_window: same " +
      "sessions, same sizes, same starts (backfill ≡ streaming semantics)") {
    val q43 = SparkEntry.queries("q43_sessionize")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_us") / 1000, r.getAs[Long]("n_events"))).toSet
    val a03 = SparkEntry.queries("a03_session_window")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_start_ms"), r.getAs[Long]("n_events"))).toSet
    assert(q43 == a03,
      s"batch and streaming sessionization diverged: " +
        s"only-batch=${q43.diff(a03).take(3)} only-stream=${a03.diff(q43).take(3)}")
  }

  test("a06 HLL estimates sit inside the 3·rsd envelope (deterministic bound)") {
    val rows = SparkEntry.queries("a06_hll_approx")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_rsd"),
        s"HLL part-count estimate outside 3·rsd for ${r.get(0)}")
      assert(r.getAs[Boolean]("orders_within_rsd"),
        s"HLL order-count estimate outside 3·rsd for ${r.get(0)}")
    }
  }

  test("headline queries are a subset of the registry") {
    assert(SparkEntry.headlines.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("media pipeline decodes partition-wise with stub codec") {
    val sess = spark
    import sess.implicits._
    val media = Seq(
      MediaPipeline.MediaRecord(1L, "image", Array.fill[Byte](1000)(1), "image/png"),
      MediaPipeline.MediaRecord(2L, "video", Array.fill[Byte](2000)(2), "video/mp4"),
      MediaPipeline.MediaRecord(3L, "image", Array.empty[Byte], "image/png")
    ).toDS()
    val decoded = MediaPipeline.decodeAll(media)
    val rows = decoded.collect().sortBy(_.media_id)
    assert(rows(0).ok && rows(0).width == 1000 % 640)
    assert(rows(1).ok && rows(1).n_frames > 1)
    assert(!rows(2).ok && rows(2).error == "empty blob")
    val frames = MediaPipeline.sampleFrames(decoded.toDF(), stride = 5)
    assert(frames.count() > 0)
  }
}
