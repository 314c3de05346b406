package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSuite {

  test("hamming64 column API computes bit distance (codegen path)") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (0L, 0L, 0), (0L, 1L, 1), (0L, 3L, 2),
      (0L, -1L, 64), (Long.MaxValue, 0L, 63),
      (0x5555555555555555L, 0xAAAAAAAAAAAAAAAAL, 64)
    ).toDF("a", "b", "expected")
    val got = df.withColumn("d", GraftFunctions.hamming64(col("a"), col("b")))
      .filter(col("d") =!= col("expected"))
    assert(got.count() == 0)
  }

  test("minhash_sigs matches the lambda formulation bit-for-bit and " +
      "nulls out on empty arrays") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1L, Seq("the quick brown", "quick brown fox", "brown fox jumps")),
      (2L, Seq("a single shingle")),
      (3L, Seq.empty[String]),
      (4L, Seq("unicode ñ ü", "tabs\tand spaces", ""))
    ).toDF("id", "sh_arr")
    val lambdaSigs = (0 until 16).map(i => expr(
      s"""array_min(transform(transform(sh_arr, sh ->
         |    CAST(conv(substring(md5(sh), 1, 7), 16, 10) AS BIGINT)),
         |  x -> (${MinHashFamily.a(i)} * x + ${MinHashFamily.b(i)})
         |    % ${MinHashFamily.p}))""".stripMargin).as(s"e$i"))
    val got = df
      .withColumn("sigs", MinHashSig.minhashSigs(col("sh_arr")))
      .select((col("id") +: col("sigs").as("sigs") +: lambdaSigs): _*)
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (id == 3L) assert(r.isNullAt(1), "empty array must yield NULL sigs")
      else {
        val native = r.getSeq[Long](1)
        val lambda = (0 until 16).map(i => r.getLong(2 + i))
        assert(native == lambda, s"id=$id: $native vs $lambda")
      }
    }
  }

  test("hyperplane_bucket matches the join-and-aggregate formulation on " +
      "the real embeddings table") {
    val sess = spark
    import sess.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = spark.range(8).select(col("id").as("p"))
      .crossJoin(spark.range(64).select(col("id").as("d")))
      .withColumn("w",
        (StableHash.h32(concat(col("p").cast("string"), lit(":"),
          col("d").cast("string"))) % 1001 - 500).cast("double") / 500.0)
    val viaJoin = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .withColumn("v", col("v").cast("double"))
      .join(broadcast(planes), "d")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("v") * col("w")).as("dot"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dot") > 0,
        pow(lit(2.0), col("p").cast("double")).cast("long")).otherwise(0L))
        .as("bucket"))
    val native = emb.select(col("vec_id"),
      HyperplaneBucket.bucket8(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("bucket"))
    assert(native.exceptAll(viaJoin).count() == 0
      && viaJoin.exceptAll(native).count() == 0)
  }

  test("hamming64 null propagation") {
    val sess = spark
    import sess.implicits._
    val df = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    val r = df.select(GraftFunctions.hamming64(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("hamming64 is SQL-callable once registered (GraftExtensions path)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", exprs => HammingDistance(exprs.head, exprs(1)), "built-in")
    val r = spark.sql("SELECT hamming64(CAST(0 AS BIGINT), CAST(7 AS BIGINT))")
      .collect()(0).getInt(0)
    assert(r == 3)
  }

  test("GraftExtensions registers every engine SQL function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Seq("hamming64", "dot_f64", "minhash_sigs", "hyperplane_bucket",
      "simhash32").foreach { name =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, _ match {
          case Seq(a, b) if name == "hamming64" => HammingDistance(a, b)
          case Seq(a, b) if name == "dot_f64" => DotDouble(a, b)
          case Seq(a) if name == "minhash_sigs" => MinHashSig(a)
          case Seq(a) if name == "hyperplane_bucket" => HyperplaneBucket(a)
          case Seq(a) => SimHash32(a)
        }, "built-in")
    }
    val r = spark.sql(
      """SELECT size(minhash_sigs(array('a b c', 'b c d'))) AS n,
        |  hyperplane_bucket(array_repeat(CAST(0.5 AS DOUBLE), 64)) AS hb,
        |  simhash32(array('x', 'y', 'x')) AS sh""".stripMargin).collect()(0)
    assert(r.getInt(0) == 16)
    assert(r.getLong(1) >= 0L && r.getLong(1) < 256L)
    assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 32))
  }

  test("simhash32 is NULL for empty / all-null token arrays, never the " +
      "0L sentinel: the aggregate spelling emits NO row there, and a " +
      "shared 0 would hamming-join every empty doc with every other at " +
      "distance 0 (MinHashSig's null-for-empty contract)") {
    val r = spark.sql(
      """SELECT simhash32(CAST(array() AS ARRAY<STRING>)) AS e,
        |  simhash32(array(CAST(NULL AS STRING))) AS an,
        |  simhash32(array('x')) AS ok""".stripMargin).collect()(0)
    assert(r.isNullAt(0), "empty array must fingerprint to NULL")
    assert(r.isNullAt(1), "all-null array must fingerprint to NULL")
    assert(!r.isNullAt(2))
  }

  test("SQL builders validate arity: a wrong-arity call names the " +
      "expected signature instead of throwing a raw " +
      "IndexOutOfBoundsException from exprs(1) during resolution") {
    // probe through sorted_pairs: the registration test above shadows
    // hamming64/dot_f64/... with temp-function shims in the shared
    // session, but not sorted_pairs — its extension-injected builder is
    // the one resolving here
    val e = intercept[Exception](
      spark.sql("SELECT sorted_pairs(array(1L), array(2L))").collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("expects 1 argument"))),
      s"expected the arity message in the cause chain, got: $e")
  }

  test("hamming64 rejects non-long inputs at analysis") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("x", 1L)).toDF("a", "b")
    intercept[Exception] {
      df.select(GraftFunctions.hamming64(col("a"), col("b"))).collect()
    }
  }

  test("dot_f64 matches the zip_with/aggregate lambda fold bit-for-bit") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.7, 0.11, 13.0)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val cmp = df.select(
      DotDouble.dotF64(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .as("lambda"))
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_f64 ragged-length inputs sum over min(|a|,|b|) — the " +
      "documented divergence from the null-padding lambda fold") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(10.0)),        // prefix: 1*10
      (Seq(2.0), Seq(5.0, 100.0, 1000.0)),    // prefix: 2*5
      (Seq(1.0, 2.0), Seq.empty[Double]))     // empty side → 0.0
      .toDF("a", "b")
    val rows = df.select(
      DotDouble.dotF64(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .as("lambda")).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(10.0, 10.0, 0.0))
    // the lambda form returns NULL for ragged inputs (zip_with null-pads);
    // pinning that divergence is the point of this test
    assert(rows.take(2).forall(_.isNullAt(1)))
  }

  test("dot_f64 null propagation and type check") {
    val sess = spark
    import sess.implicits._
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(DotDouble.dotF64(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    val bad = Seq((Seq(1), Seq(1.0))).toDF("a", "b")
    intercept[Exception] {
      bad.select(DotDouble.dotF64(col("a"), col("b"))).collect()
    }
  }

  test("stable hashes match their DuckDB formulas' semantics") {
    val sess = spark
    import sess.implicits._
    val df = Seq("abc").toDF("s")
    // md5('abc') = 900150983cd24fb0... → first 8 hex = 0x90015098
    assert(df.select(StableHash.h32(col("s"))).collect()(0).getLong(0)
      == 0x90015098L)
    assert(df.select(StableHash.h60(col("s"))).collect()(0).getLong(0)
      == java.lang.Long.parseLong("900150983cd24fb", 16))
  }
}
