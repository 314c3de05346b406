package graft.streaming

import graft.SparkSuite

/** E6 dead-set view/replay/delete over the offset-marker design. */
class DeadSetSpec extends SparkSuite {

  private def seed(topics: FileTopicIO, n: Int): Unit =
    topics.append(envelopes("app", (0 until n).map(i =>
      (s"k$i", s"v$i", ts(f"2024-01-01 00:00:${i}%02d")))), "app_dead_letter")

  test("view peeks without advancing; delete advances the marker") {
    val dir = tmpDir("deadset")
    val topics = new FileTopicIO(s"$dir/topics")
    val ds = new DeadSet(topics, s"$dir/markers")
    seed(topics, 5)

    assert(ds.view(spark, "app", 3).count() == 3)
    assert(ds.view(spark, "app", 3).count() == 3) // peek again, unchanged
    assert(ds.delete(spark, "app", 2) == 2)
    val remaining = ds.view(spark, "app", 10).collect()
    assert(remaining.length == 3)
    assert(remaining.map(_.getAs[Long]("offset")).min == 2)
  }

  test("replay copies to instant topic and acks") {
    val dir = tmpDir("deadset2")
    val topics = new FileTopicIO(s"$dir/topics")
    val ds = new DeadSet(topics, s"$dir/markers")
    seed(topics, 4)

    assert(ds.replay(spark, "app", 2) == 2)
    assert(topics.read(spark, "app_instant").count() == 2)
    assert(ds.view(spark, "app", 10).count() == 2)
    // replay the rest; dead set drains
    assert(ds.replay(spark, "app", 10) == 2)
    assert(ds.view(spark, "app", 10).count() == 0)
    assert(topics.read(spark, "app_instant").count() == 4)
  }

  test("two concurrent replays of the same N publish each dead message " +
      "exactly once (per-entity lock serializes the marker RMW)") {
    val dir = tmpDir("deadset4")
    val topics = new FileTopicIO(s"$dir/topics")
    val ds = new DeadSet(topics, s"$dir/markers")
    seed(topics, 6)

    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val replayed = new java.util.concurrent.atomic.AtomicLong(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to 2).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          gate.await()
          replayed.addAndGet(ds.replay(spark, "app", 6))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"replay threw: ${errs.peek()}")
    // one replay wins all 6; the loser sees the advanced marker → 0
    assert(replayed.get() == 6)
    assert(topics.read(spark, "app_instant").count() == 6)
    assert(ds.view(spark, "app", 10).count() == 0)
  }

  test("empty dead set: all operations are no-ops") {
    val dir = tmpDir("deadset3")
    val topics = new FileTopicIO(s"$dir/topics")
    val ds = new DeadSet(topics, s"$dir/markers")
    assert(ds.view(spark, "nothere", 5).count() == 0)
    assert(ds.delete(spark, "nothere", 5) == 0)
    assert(ds.replay(spark, "nothere", 5) == 0)
  }
}
