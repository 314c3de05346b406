package graft.streaming

import graft.SparkSuite

/** The test/emulation transport's log semantics: contiguous offsets across
  * appends (now maintained by a driver-side last-offset cache instead of a
  * per-append full-topic scan) and same-topic append serialization. */
class FileTopicIOSpec extends SparkSuite {

  test("offsets stay contiguous across appends and the cache agrees with " +
      "the data on disk") {
    val topics = new FileTopicIO(tmpDir("ftio"))
    topics.append(envelopes("t", (0 until 3).map(i =>
      (s"k$i", s"v$i", ts("2024-01-01 00:00:00")))), "t")
    topics.append(envelopes("t", (0 until 4).map(i =>
      (s"k$i", s"v$i", ts("2024-01-01 00:00:01")))), "t")
    assert(topics.maxOffset(spark, "t") == 6L)
    val offsets = topics.read(spark, "t").select("offset")
      .collect().map(_.getLong(0)).sorted
    assert(offsets.toSeq == (0L to 6L))
  }

  test("a fresh instance cold-scans the topic once, then continues the " +
      "sequence (cache is an optimization, not the source of truth)") {
    val dir = tmpDir("ftio2")
    val a = new FileTopicIO(dir)
    a.append(envelopes("t", Seq(("k", "v", ts("2024-01-01 00:00:00")))), "t")
    val b = new FileTopicIO(dir)
    assert(b.maxOffset(spark, "t") == 0L)
    b.append(envelopes("t", Seq(("k2", "v2", ts("2024-01-01 00:00:01")))), "t")
    assert(b.maxOffset(spark, "t") == 1L)
    assert(b.read(spark, "t").select("offset")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
  }

  test("appendIdempotent survives a crash BETWEEN the append and the " +
      "applied marker: the intent snapshot lets the replay delete the " +
      "crashed attempt's files and re-run cleanly — marker-after-append " +
      "alone duplicated retries on exactly-that-window replays") {
    import java.nio.file.{Files, Paths}
    val base = tmpDir("ftio4")
    val topics = new FileTopicIO(base)
    topics.append(envelopes("t", Seq(("seed", "v", ts("2024-01-01 00:00:00")))), "t")
    val d = Paths.get(s"$base/t")
    def parts(): Set[String] = {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("_")
            && !n.startsWith(".")).toSet
      } finally s.close()
    }
    val preAppend = parts()
    val batch = envelopes("t", (0 until 3).map(i =>
      (s"k$i", s"v$i", ts("2024-01-01 00:00:01"))))
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4)
    // simulate the crash window: data fully written, applied marker not
    // yet created — the intent (with the pre-append snapshot) remains
    Files.delete(d.resolve("_applied-tok1"))
    Files.write(d.resolve("_intent-tok1"),
      preAppend.toSeq.sorted.mkString("\n").getBytes)
    // the REPLAY must not duplicate: recovery removes the crashed
    // attempt's files, then re-appends once
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4,
      "replay after the simulated crash must not duplicate the batch")
    assert(Files.exists(d.resolve("_applied-tok1")))
    assert(!Files.exists(d.resolve("_intent-tok1")))
    // and a plain replay with the applied marker present stays a no-op
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4)
  }

  test("concurrent appends to the same topic serialize: offsets are unique " +
      "and contiguous") {
    val topics = new FileTopicIO(tmpDir("ftio3"))
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(4)
    (0 until 4).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit =
          topics.append(envelopes("t", (0 until 5).map(i =>
            (s"k$t-$i", "v", ts("2024-01-01 00:00:00")))), "t")
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val offsets = topics.read(spark, "t").select("offset")
      .collect().map(_.getLong(0)).sorted
    assert(offsets.toSeq == (0L until 20L))
    assert(topics.maxOffset(spark, "t") == 19L)
  }
}
