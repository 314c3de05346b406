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

  test("appendIdempotent survives a crash BETWEEN the move-in and the " +
      "applied marker: recovery deletes the crashed attempt's token-stamped " +
      "files and re-runs cleanly — marker-after-append alone duplicated " +
      "retries on exactly-that-window replays") {
    import java.nio.file.{Files, Paths}
    val base = tmpDir("ftio4")
    val topics = new FileTopicIO(base)
    topics.append(envelopes("t", Seq(("seed", "v", ts("2024-01-01 00:00:00")))), "t")
    val d = Paths.get(s"$base/t")
    val batch = envelopes("t", (0 until 3).map(i =>
      (s"k$i", s"v$i", ts("2024-01-01 00:00:01"))))
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4)
    // simulate the crash window: data files fully moved into the topic
    // dir (token-stamped), applied marker not yet created
    Files.delete(d.resolve("_applied-tok1"))
    // the REPLAY must not duplicate: recovery removes the crashed
    // attempt's stamped files, then re-appends once
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4,
      "replay after the simulated crash must not duplicate the batch")
    assert(Files.exists(d.resolve("_applied-tok1")))
    // and a plain replay with the applied marker present stays a no-op
    topics.appendIdempotent(batch, "t", "tok1")
    assert(topics.read(spark, "t").count() == 4)
  }

  test("a replay does NOT delete records another writer committed to the " +
      "same topic between the crash and the replay — recovery is scoped " +
      "to the crashed token's own files (the whole-topic snapshot diff " +
      "this replaces destroyed exactly those interleaved records)") {
    import java.nio.file.{Files, Paths}
    val base = tmpDir("ftio5")
    val topics = new FileTopicIO(base)
    val d = Paths.get(s"$base/t")
    val batch = envelopes("t", (0 until 3).map(i =>
      (s"k$i", s"v$i", ts("2024-01-01 00:00:01"))))
    topics.appendIdempotent(batch, "t", "tokA")
    // crash window for tokA: files in, marker missing
    Files.delete(d.resolve("_applied-tokA"))
    // ANOTHER writer (plain append = dispatch emit; different-token
    // idempotent append = dead-set replay) commits in between
    topics.append(envelopes("t", Seq(("other", "w", ts("2024-01-01 00:00:02")))), "t")
    topics.appendIdempotent(envelopes("t", Seq(("other2", "w2",
      ts("2024-01-01 00:00:03")))), "t", "tokB")
    // tokA's replay: must keep both interleaved writers' records and
    // land its own batch exactly once
    topics.appendIdempotent(batch, "t", "tokA")
    val keys = topics.read(spark, "t").selectExpr("cast(key as string)")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("k0", "k1", "k2", "other", "other2"),
      s"interleaved writers' records must survive tokA's replay; got $keys")
    // offsets stay unique and monotone (a reclaimed crashed attempt may
    // leave a gap — that is fine; duplicates are not)
    val offsets = topics.read(spark, "t").select("offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(offsets.distinct == offsets)
    assert(topics.maxOffset(spark, "t") == offsets.last)
  }

  test("a stale pre-rework _intent file is swept, not honored: its " +
      "whole-topic snapshot semantics are the superseded loss path") {
    import java.nio.file.{Files, Paths}
    val base = tmpDir("ftio6")
    val topics = new FileTopicIO(base)
    topics.append(envelopes("t", Seq(("seed", "v", ts("2024-01-01 00:00:00")))), "t")
    val d = Paths.get(s"$base/t")
    // a pre-rework crashed attempt left an intent snapshotting an EMPTY
    // topic; honoring it would delete the seed record on replay
    Files.write(d.resolve("_intent-tokOld"), "".getBytes)
    topics.appendIdempotent(envelopes("t", Seq(("new", "w",
      ts("2024-01-01 00:00:01")))), "t", "tokOld")
    assert(!Files.exists(d.resolve("_intent-tokOld")))
    val keys = topics.read(spark, "t").selectExpr("cast(key as string)")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("new", "seed"))
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
