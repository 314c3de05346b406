package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

/** The streaming serving pattern a real pipeline uses: a query stream
  * probed against a PERSISTED ANN index from a `foreachBatch` handler —
  * load once per micro-batch, probe via [[SimilarityOps.probeIndex]],
  * release the handle — while the index is concurrently compacted and
  * vacuumed between (and DURING) batches. s20 gates the batch
  * correctness of the compacted chain; this spec gates the micro-batch
  * lifecycle around it: load-once-per-batch, no mid-compaction
  * failure, and the read lease keeping an in-flight batch's chain
  * readable through a vacuum. */
class AnnIndexStreamSpec extends SparkSuite {

  private def staleClock: Long =
    System.currentTimeMillis() + AnnIndex.OrphanMinAgeMillis + 60000L

  test("foreachBatch probes load once per batch and survive a compact+" +
      "vacuum landing WHILE a batch holds its handle: the in-flight " +
      "batch serves from its leased chain, the next batch serves the " +
      "compacted version, and streaming results equal the static probe") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = s"${tmpDir("annstream")}/ivf"
    val cents = (1 to 4).map(i =>
      (i.toLong, Seq(i.toDouble, 1.0), 1.0)).toDF("cent_id", "cv", "cn")
    val posts = (1 to 8).map(i => (i.toLong + 100,
      Seq(i.toDouble, 2.0), 2.0, (i % 4 + 1).toLong))
      .toDF("vec_id", "vd", "nrm", "cell")
    AnnIndex.publish(cents,
      posts.filter($"vec_id" % 2 === 0), dir, k = 4) // v1: evens
    AnnIndex.publishDelta(
      posts.filter($"vec_id" % 2 === 1), dir) // v2: odds (chain v1+v2)

    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val loaded = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    @volatile var parkedLease: Option[java.nio.file.Path] = None
    val results =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val failures =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    val in = MemoryStream[(Long, Seq[Double], Double)]
    val q = in.toDF().toDF("q_id", "qv", "qn").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        if (rows.nonEmpty) try {
          val h = AnnIndex.load(spark, dir) // ONCE per micro-batch
          loads.incrementAndGet()
          try {
            if (rows.exists(_.getLong(0) == 77L)) {
              // the marked batch parks holding its handle, so the
              // main thread can compact + vacuum around it
              parkedLease = h.leaseFile
              loaded.countDown()
              resume.await(60, TimeUnit.SECONDS)
              ()
            }
            SimilarityOps.probeIndex(df, h, nprobe = 2, topK = 3)
              .collect().foreach(r => results.add(
                s"${r.getLong(0)}|${r.getLong(2)}|${r.getLong(3)}|" +
                  s"${r.getDouble(4)}"))
          } finally h.release()
        } catch { case e: Throwable =>
          failures.add(String.valueOf(e)); throw e
        }
        ()
      }
      .option("checkpointLocation", s"${tmpDir("annstreamck")}/ck")
      .start()
    try {
      def await(cond: => Boolean, what: String): Unit = {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
        assert(cond, s"timed out waiting for $what; failures=" +
          failures.asScala.mkString("; "))
      }
      def got(prefix: String): Boolean =
        results.asScala.exists(_.startsWith(prefix))
      // batch 1: two queries against the live delta chain
      in.addData((71L, Seq(1.0, 2.0), 1.0), (72L, Seq(3.0, 2.0), 1.0))
      await(got("71|") && got("72|"), "batch 1 results")
      // batch 2 parks inside its handle...
      in.addData((77L, Seq(2.0, 2.0), 1.0))
      assert(loaded.await(60, TimeUnit.SECONDS), "batch 2 never loaded")
      // ...while the index is compacted AND vacuumed under it: the
      // batch's lease (refreshed against the injected clock, as a
      // live reader's would be) keeps its loaded chain readable
      assert(AnnIndex.compact(spark, dir) == "v3")
      parkedLease.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(staleClock)))
      AnnIndex.vacuum(dir, keep = 0, now = staleClock)
      assert(Files.exists(Paths.get(dir, "v1")) &&
        Files.exists(Paths.get(dir, "v2")),
        "the in-flight batch's leased chain must survive the vacuum")
      resume.countDown()
      await(got("77|"), "batch 2 results after concurrent compact+vacuum")
      // batch 3 serves from the COMPACTED version
      in.addData((78L, Seq(4.0, 2.0), 1.0))
      await(got("78|"), "batch 3 results")
      assert(failures.isEmpty,
        s"handlers must never fail: ${failures.asScala.mkString("; ")}")
      assert(loads.get() == 3,
        s"load must run once per non-empty batch, ran ${loads.get()}")
      // released handles leave no lease residue, so the chain the
      // parked batch pinned is reclaimable by the next vacuum
      AnnIndex.vacuum(dir, keep = 0, now = staleClock)
      assert(!Files.exists(Paths.get(dir, "v1")) &&
        !Files.exists(Paths.get(dir, "v2")),
        "released leases must free the superseded chain")
      // the streaming answers are exactly the static probe's over the
      // final compacted index — micro-batch serving changes nothing
      val hFinal = AnnIndex.load(spark, dir)
      val static =
        try SimilarityOps.probeIndex(
          Seq((71L, Seq(1.0, 2.0), 1.0), (72L, Seq(3.0, 2.0), 1.0),
            (77L, Seq(2.0, 2.0), 1.0), (78L, Seq(4.0, 2.0), 1.0))
            .toDF("q_id", "qv", "qn"),
          hFinal, nprobe = 2, topK = 3)
          .collect().map(r =>
            s"${r.getLong(0)}|${r.getLong(2)}|${r.getLong(3)}|" +
              s"${r.getDouble(4)}").toSet
        finally hFinal.release()
      assert(results.asScala.toSet == static,
        s"streaming ${results.asScala.toSet} vs static $static")
    } finally q.stop()
  }
}
