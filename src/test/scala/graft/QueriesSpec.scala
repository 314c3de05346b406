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
    // d02/d03/d05/d24/d25/d26: near-dup pairs can legitimately be absent
    // at tiny SF — all other queries must be non-empty
    assert(empties.forall(n =>
      n.startsWith("d02") || n.startsWith("d03") || n.startsWith("d05") ||
        n.startsWith("d24") || n.startsWith("d25") || n.startsWith("d26")),
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

  test("a24 Markov rows: each from-state's transition probabilities sum " +
      "to 1 and transition counts reconcile with the event count") {
    val rows = SparkEntry.queries("a24_markov_transitions")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val pSum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-3, s"P(·|$from) sums to $pSum")
    }
    // every event except each user's last is a transition source
    val ev = Tables(spark, sf0001).events
    val nPairs = rows.map(_.getAs[Long]("n")).sum
    val nUsers = ev.select("user_id").distinct().count()
    assert(nPairs == ev.count() - nUsers)
  }

  test("s13 NDCG is in [0,1], and equals 1 exactly when the bucket " +
      "retrieval reproduces the true top-3 in order (cross-check vs s08)") {
    val ndcg = SparkEntry.queries("s13_ann_ndcg")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_retrieved"), r.getAs[Double]("ndcg_at_3"))).toMap
    assert(ndcg.nonEmpty)
    ndcg.values.foreach { case (_, v) => assert(v >= 0.0 && v <= 1.0 + 1e-9) }
    // recall@3 = 1 (s08) and a full 3-deep retrieved list force NDCG = 1:
    // all graded neighbors are in the bucket, and exact-cosine re-ranking
    // inside the bucket orders them identically to the ground truth
    val recall = SparkEntry.queries("s08_ann_recall")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("recall_at_3")).toMap
    for ((q, r3) <- recall if r3 == 1.0; (n, v) <- ndcg.get(q) if n == 3)
      assert(math.abs(v - 1.0) < 1e-9, s"q$q: recall 1 but ndcg $v")
    // and NDCG can never exceed what recall admits: zero recall → zero NDCG
    for ((q, r3) <- recall if r3 == 0.0; (_, v) <- ndcg.get(q))
      assert(v == 0.0, s"q$q: recall 0 but ndcg $v")
  }

  test("p14 curriculum: phases partition each source 1..3 and the quality " +
      "ramp holds (every phase-1 doc >= every phase-3 doc, per source)") {
    val rows = SparkEntry.queries("p14_curriculum_order")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val phases = rs.map(_.getAs[Long]("phase")).distinct.sorted
      assert(phases.forall(p => p >= 1 && p <= 3), s"$src phases $phases")
      val byPhase = rs.groupBy(_.getAs[Long]("phase"))
        .view.mapValues(_.map(_.getAs[Double]("quality"))).toMap
      for (p1 <- byPhase.get(1L); p3 <- byPhase.get(3L))
        assert(p1.min >= p3.max,
          s"$src: phase-1 min ${p1.min} < phase-3 max ${p3.max}")
      // positions are dense 1..n within each (source, phase)
      byPhase.keys.foreach { p =>
        val pos = rs.filter(_.getAs[Long]("phase") == p)
          .map(_.getAs[Long]("pos")).sorted.toSeq
        assert(pos == (1L to pos.size.toLong),
          s"$src/$p positions not dense: ${pos.take(5)}…")
      }
    }
  }
}
