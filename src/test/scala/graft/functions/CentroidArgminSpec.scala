package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CentroidArgmin must be bit-identical to the min_by DataFrame spelling
  * it replaced in SimilarityOps.kmeansAssignments (s05/d10/x07 share that
  * oracle-gated pipeline): same in-order dot fold, same 4dp HALF_UP
  * round, same (max cc, min cid) total order. */
class CentroidArgminSpec extends SparkSuite {

  private def mkVecs(seed: Long, n: Int, dims: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      // occasional duplicated vectors force exact cc ties across
      // centroids so the cid tiebreak is exercised, not just coded
      val base = if (i % 7 == 0) 1L else i.toLong
      val r = new scala.util.Random(base * 31 + seed)
      (i.toLong, Seq.fill(dims)(math.rint(r.nextDouble() * 20 - 10) / 4.0))
    }
  }

  test("matches the min_by(struct(-cc, cid)) formulation bit-for-bit, " +
      "ties (duplicate centroids' cc) broken by smallest cid") {
    val sess = spark
    import sess.implicits._
    val emb = mkVecs(42L, 120, 16).toDF("vec_id", "vd0")
      .withColumn("vd", expr("transform(vd0, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(DotDouble.dotF64(col("vd"), col("vd"))))
      .select(col("vec_id"), col("vd"), col("nrm"))
    // first 6 vectors as centroids; vec 7 duplicates vec 1's values via
    // the mkVecs base trick, so at least one probe has two centroids at
    // the exact same rounded cosine
    val cents = emb.filter(col("vec_id") <= 6)
      .select(col("vec_id").as("cid"), col("vd").as("cv"),
        col("nrm").as("cn"))
    val old = emb.join(broadcast(cents), lit(true))
      .withColumn("cc", round(DotDouble.dotF64(col("vd"), col("cv"))
        / (col("nrm") * col("cn")), 4))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("cc")),
        struct(negate(col("cc")), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.cc").as("cc"))
    val carr = cents.agg(sort_array(collect_list(
      struct(col("cid"), col("cv"), col("cn")))).as("cents"))
    val neu = emb.join(broadcast(carr), lit(true))
      .withColumn("m", CentroidArgmin.centroidArgmin(
        col("vd"), col("nrm"), col("cents")))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.cc").as("cc"))
    val oldRows = old.orderBy("vec_id").collect()
    val neuRows = neu.orderBy("vec_id").collect()
    assert(oldRows.length == neuRows.length && oldRows.length == 120)
    oldRows.zip(neuRows).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1), s"cid mismatch at vec ${a.getLong(0)}")
      assert(java.lang.Double.compare(a.getDouble(2), b.getDouble(2)) == 0,
        s"cc mismatch at vec ${a.getLong(0)}: ${a.getDouble(2)} vs ${b.getDouble(2)}")
    }
  }

  test("interpreted eval agrees with codegen (both paths share the " +
      "round4/compareDoubles semantics), zero-norm centroid (NaN cosine) " +
      "never wins over a finite one, empty centroid array yields NULL") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), 5.0),
      (2L, Seq(-3.0, 0.5), 2.0)
    ).toDF("vec_id", "vd", "nrm")
    // centroid 9 has cn = 0 AND a zero vector -> cc = 0/0 = NaN (a
    // nonzero dot over cn = 0 would be +Inf, which LEGITIMATELY wins —
    // min_by agrees); 4 and 5 are finite
    val cents = Seq(
      (9L, Seq(0.0, 0.0), 0.0),
      (4L, Seq(1.0, 0.0), 1.0),
      (5L, Seq(1.0, 0.0), 1.0)
    ).toDF("cid", "cv", "cn")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv"), col("cn"))))
        .as("cents"))
    val out = df.join(broadcast(cents), lit(true))
      .withColumn("m", CentroidArgmin.centroidArgmin(
        col("vd"), col("nrm"), col("cents")))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.cc").as("cc"))
      .orderBy("vec_id").collect()
    // centroids 4 and 5 tie exactly (identical cv/cn): smallest cid wins
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(!out.exists(r => r.getLong(1) == 9L))
    // empty centroid array -> NULL struct (total, never throws)
    val empty = Seq((1L, Seq(1.0), 1.0)).toDF("vec_id", "vd", "nrm")
      .withColumn("cents", expr(
        "CAST(array() AS ARRAY<STRUCT<cid: BIGINT, cv: ARRAY<DOUBLE>, cn: DOUBLE>>)"))
      .withColumn("m", CentroidArgmin.centroidArgmin(
        col("vd"), col("nrm"), col("cents")))
      .select(col("m")).collect()
    assert(empty.head.isNullAt(0))
    // round4 mirrors Catalyst RoundBase's double path
    assert(CentroidArgmin.round4(0.00005) == 0.0001) // HALF_UP at the boundary
    assert(CentroidArgmin.round4(-0.00005) == -0.0001)
    assert(CentroidArgmin.round4(Double.NaN).isNaN)
    assert(CentroidArgmin.round4(Double.PositiveInfinity)
      == Double.PositiveInfinity)
  }
}
