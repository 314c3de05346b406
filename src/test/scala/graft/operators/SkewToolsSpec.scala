package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSuite {

  test("salted join returns exactly the unsalted join's rows") {
    val li = Tables(spark, sf0001).lineitem
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf0001).orders
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = SkewTools.saltedJoin(li, o, "l_orderkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted aggregation equals direct groupBy sum/count") {
    val li = Tables(spark, sf0001).lineitem
    val direct = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"), count(lit(1)).as("n"))
    val salted = SkewTools.saltedSumCount(li, "l_suppkey", "l_quantity", 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("overlapJoinPreflight prices the prefix-sliced explode at " +
      "minOverlap c >= 2: candidate estimate equals the JVM-computed " +
      "sum of fL(e)*fR(e) over each row's (size - c + 1) smallest " +
      "distinct elements, and c = 1 reproduces the full estimate") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, Seq(3L, 1L, 2L, 9L)), (2L, Seq(1L, 5L)),
      (3L, Seq(9L, 8L, 7L)))
    val r = Seq((7L, Seq(1L, 2L, 9L)), (8L, Seq(7L, 8L, 9L, 1L)))
    def jvmEstimate(c: Int): Long = {
      def pfx(a: Seq[Long]): Seq[Long] = {
        val d = a.distinct.sorted
        d.take(math.max(d.size - (c - 1), 0))
      }
      val fl = l.flatMap(x => pfx(x._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val fr = r.flatMap(x => pfx(x._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      fl.keySet.intersect(fr.keySet).toSeq
        .map(e => fl(e) * fr(e)).sum
    }
    for (c <- Seq(1, 2, 3)) {
      val row = SkewTools.overlapJoinPreflight(
        l.toDF("lid", "la"), col("la"),
        r.toDF("rid", "ra"), col("ra"), minOverlap = c).head()
      assert(row.getAs[Long]("est_candidate_rows") == jvmEstimate(c),
        s"c=$c: ${row.getAs[Long]("est_candidate_rows")} vs " +
          s"${jvmEstimate(c)}")
    }
    assert(jvmEstimate(1) > jvmEstimate(2), "fixture self-check: the " +
      "prefix must actually shrink the estimate")
  }

  test("overlapJoinPreflight prices STRING prefixes in the rewrite's " +
      "own (xxhash64, elem) order — the estimate equals the JVM sum " +
      "over hash-ordered prefixes, and differs from the raw-order sum " +
      "on this fixture (a stale raw-order preflight would mis-price " +
      "the join the fail mode refuses or admits)") {
    val sess = spark
    import sess.implicits._
    val pool = ('a' to 'j').map(c => s"tok_$c$c")
    val rnd = new scala.util.Random(77)
    def arr() = rnd.shuffle(pool).take(3 + rnd.nextInt(5)).toSeq
    val l = (1L to 20L).map(i => (i, arr()))
    val r = (1L to 15L).map(i => (i, arr()))
    // hash each pool token through Spark itself — the JVM twin must use
    // the SAME xxhash64(seed=42) the engine slices by
    val hashOf = pool.toDF("t")
      .select(col("t"), xxhash64(col("t")).as("h"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val c = 2
    def estimate(order: String => (Long, String)): Long = {
      def pfx(a: Seq[String]): Seq[String] = {
        val d = a.distinct.sortBy(order)
        d.take(math.max(d.size - (c - 1), 0))
      }
      val fl = l.flatMap(x => pfx(x._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val fr = r.flatMap(x => pfx(x._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      fl.keySet.intersect(fr.keySet).toSeq.map(e => fl(e) * fr(e)).sum
    }
    val hashOrdered = estimate(t => (hashOf(t), t))
    val rawOrdered = estimate(t => (0L, t))
    assert(hashOrdered != rawOrdered,
      "fixture self-check: the two orders must price differently here")
    val row = SkewTools.overlapJoinPreflight(
      l.toDF("lid", "la"), col("la"),
      r.toDF("rid", "ra"), col("ra"), minOverlap = c).head()
    assert(row.getAs[Long]("est_candidate_rows") == hashOrdered,
      s"${row.getAs[Long]("est_candidate_rows")} vs hash=$hashOrdered " +
        s"(raw would be $rawOrdered)")
  }

  test("sampled preflight contract: the exact path's schema is " +
      "UNCHANGED (d31's oracle pins it), the sampled path appends a " +
      "sample_fraction column, scales absolutes by 1/f², and keeps " +
      "shares scale-invariant") {
    val sess = spark
    import sess.implicits._
    // element 1L in every row: the only common element, so the sampled
    // share must read 10000 bp whatever rows the sample keeps
    val l = (1L to 40L).map(i => (i, Seq(1L, i + 100))).toDF("lid", "la")
    val r = (1L to 40L).map(i => (i, Seq(1L, i + 900))).toDF("rid", "ra")
    val exact = SkewTools.overlapJoinPreflight(l, col("la"), r, col("ra"))
    assert(!exact.columns.contains("sample_fraction"),
      exact.columns.mkString(","))
    assert(exact.head().getAs[Long]("est_candidate_rows") == 1600L)
    val s = SkewTools.overlapJoinPreflight(l, col("la"), r, col("ra"),
      sampleFraction = 0.5)
    val row = s.head()
    assert(s.columns.contains("sample_fraction"))
    assert(row.getAs[Double]("sample_fraction") == 0.5)
    assert(row.getAs[Long]("max_share_bp") == 10000L)
    val est = row.getAs[Long]("est_candidate_rows")
    // nl·nr·4 for the sampled row counts: positive, ≤ the all-rows
    // bound 40·40·4, and divisible by the 1/f² = 4 scale factor
    assert(est > 0 && est <= 6400L && est % 4 == 0, est.toString)
    // out-of-range fractions mean exact — same schema, same estimate
    val ignored = SkewTools.overlapJoinPreflight(l, col("la"), r, col("ra"),
      sampleFraction = 0.0)
    assert(!ignored.columns.contains("sample_fraction"))
    assert(ignored.head().getAs[Long]("est_candidate_rows") == 1600L)
    // hamming twin: provenance column only when sampled
    val hl = (1L to 20L).map(i => (i, i * 1024L)).toDF("lid", "lfp")
    val hExact = SkewTools.hammingJoinPreflight(hl, col("lfp"),
      hl, col("lfp"), k = 3)
    assert(!hExact.columns.contains("sample_fraction"))
    val hS = SkewTools.hammingJoinPreflight(hl, col("lfp"),
      hl, col("lfp"), k = 3, sampleFraction = 0.5)
    assert(hS.columns.contains("sample_fraction"))
    assert(hS.head().getAs[Double]("sample_fraction") == 0.5)
  }

  test("sampled estimator internal consistency over seeded random " +
      "fixtures: scaled max never exceeds scaled est, the share stays " +
      "in [0, 10000], the diagnosis is keyed off exactly the reported " +
      "share, and provenance rides every sampled report") {
    val sess = spark
    import sess.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      def side(n: Int): Seq[(Long, Seq[Long])] =
        (1 to n).map { i =>
          val len = rnd.nextInt(5) // some empty arrays
          (i.toLong, Seq.fill(len)(rnd.nextInt(30).toLong))
        }
      val l = side(30 + rnd.nextInt(30)).toDF("lid", "la")
      val r = side(30 + rnd.nextInt(30)).toDF("rid", "ra")
      val row = SkewTools.overlapJoinPreflight(l, col("la"), r, col("ra"),
        sampleFraction = 0.5).head()
      assert(row.getAs[Double]("sample_fraction") == 0.5, s"seed $seed")
      val est = row.getAs[Long]("est_candidate_rows")
      val mx = row.getAs[Long]("max_element_rows")
      assert(est >= 0 && mx >= 0 && mx <= est, s"seed $seed: max=$mx est=$est")
      val shareIdx = row.fieldIndex("max_share_bp")
      val diagnosis = row.getAs[String]("diagnosis")
      if (row.isNullAt(shareIdx)) {
        // only the empty aggregate leaves the share NULL — est must be
        // the guarded 0 and the diagnosis must not fire off a NULL
        assert(est == 0L, s"seed $seed: null share with est=$est")
        assert(diagnosis == "ok", s"seed $seed: $diagnosis")
      } else {
        val share = row.getAs[Long]("max_share_bp")
        assert(share >= 0 && share <= 10000, s"seed $seed: share=$share")
        assert((share >= 1000) == (diagnosis != "ok"),
          s"seed $seed: share=$share but diagnosis '$diagnosis'")
      }
    }
  }

  test("an EMPTY frequency aggregate reports 0 candidates, never NULL: " +
      "a NULL here rendered as '>Long.Max' in the audit line — the " +
      "string reserved for true BIGINT overflow — reporting a tiny " +
      "join as catastrophically hot (routine under sampling, where a " +
      "small side draws no rows)") {
    val sess = spark
    import sess.implicits._
    // disjoint element sets: the count-table join is empty, the one-row
    // aggregate's sums/maxes are NULL before the output guard
    val l = (1L to 5L).map(i => (i, Seq(i + 100))).toDF("lid", "la")
    val r = (1L to 5L).map(i => (i, Seq(i + 900))).toDF("rid", "ra")
    val row = SkewTools.overlapJoinPreflight(l, col("la"), r, col("ra"))
      .head()
    assert(!row.isNullAt(row.fieldIndex("est_candidate_rows")),
      "empty aggregate must not ride NULL into the report")
    assert(row.getAs[Long]("est_candidate_rows") == 0L)
    assert(row.getAs[Long]("max_element_rows") == 0L)
    assert(row.getAs[Long]("n_common_elements") == 0L)
  }

  test("shareBp stays exact through the BIGINT range and survives the " +
      "decimal-overflow extreme (est > Long.Max) where a plain decimal " +
      "x10000 would go NULL and mask the hot-element diagnosis") {
    import org.apache.spark.sql.functions._
    def share(maxS: String, estS: String): Long =
      spark.sql(s"SELECT cast('$maxS' as decimal(38,0)) as max_dec, " +
          s"cast('$estS' as decimal(38,0)) as est_dec")
        .select(SkewTools.shareBp.as("bp"))
        .head().getAs[Long]("bp")
    // exact branch: floor(10000*3/7) = 4285
    assert(share("3", "7") == 4285L)
    // exact at the top of the BIGINT range (max = est = Long.Max -> 10000)
    assert(share("9223372036854775807", "9223372036854775807") == 10000L)
    // overflow extreme: est ~ 8.5e37 (fL = fR = 9.2e18 squared); a
    // decimal x10000 would exceed 38 digits -> NULL -> 'ok'. The double
    // path reports the ~50% share.
    val bp = share("42535295865117307932921825928971026432",
      "85070591730234615865843651857942052864")
    assert(bp == 5000L || bp == 4999L, s"got $bp")
    assert(bp >= 1000L, "the diagnosis bound must still see a hot share")
  }

  test("GraftSession builder exposes the hamming64 extension in SQL") {
    // the shared test session may predate the extension; build verifies conf
    val s = graft.GraftSession.build("graft-skew-test", "local[2]", 2)
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
