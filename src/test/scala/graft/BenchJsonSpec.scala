package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench accounting contract (round-5 postmortem): a crashed query must
  * contribute nothing to queries/total and must be named in failed — a
  * time-to-crash is not a benchmark result. */
class BenchJsonSpec extends AnyFunSuite {

  private val names = Seq("q_a", "q_b", "q_c")
  private val timed = Map(
    "q_a" -> List(1.5, 1.25, 2.0),
    "q_b" -> List(0.5),
    "q_c" -> List(3.0, 2.75))

  test("all-green: min-of-passes per query, summed total, no failed key") {
    val j = Bench.resultJson(names, timed, Map.empty, "/sf")
    assert(j.contains(""""n_queries":3"""))
    assert(j.contains(""""n_failed":0"""))
    assert(j.contains(""""q_a":1.250"""))
    assert(j.contains(""""value":4.500""")) // 1.25 + 0.5 + 2.75
    assert(!j.contains("failed\":["))
  }

  test("a failed query is excluded from queries/total and listed") {
    val j = Bench.resultJson(names, timed - "q_b",
      Map("q_b" -> "boom"), "/sf")
    assert(j.contains(""""n_queries":2"""))
    assert(j.contains(""""n_failed":1"""))
    assert(j.contains(""""value":4.000""")) // 1.25 + 2.75, no q_b
    assert(j.contains(""""failed":["q_b"]"""))
    assert(!j.contains(""""q_b":"""))
  }

  test("a query that failed in ONE pass but has times recorded is still a " +
      "failure (partial-crash times are not results)") {
    val j = Bench.resultJson(names, timed, Map("q_c" -> "flaky"), "/sf")
    assert(j.contains(""""n_queries":2"""))
    assert(j.contains(""""value":1.750""")) // 1.25 + 0.5
    assert(j.contains(""""failed":["q_c"]"""))
  }

  test("the line is valid JSON with host/stream fragments spliced in") {
    val j = Bench.resultJson(names, timed, Map("q_b" -> "x"), "/sf",
      hostJson = ""","calibration_sec":{"before":0.5,"after":0.6}""",
      streamJson = ""","stream":{"events":10,"sec":1.0,"events_per_sec":10}""")
    val parsed = ujson(j)
    assert(parsed.contains("calibration_sec") && parsed.contains("stream"))
  }

  test("stream fragment: BEST of the measured passes is reported (min " +
      "seconds), stream_passes carries the pass count, and the main runs " +
      "the pinned multi-pass count") {
    val j = Bench.streamJson(500000L, Seq(
      (4.0, 125000.0), (3.2, 156250.0), (5.1, 98039.0)))
    assert(j.contains("\"sec\":3.200"), j)
    assert(j.contains("\"events_per_sec\":156250"), j)
    assert(j.contains("\"stream_passes\":3"), j)
    // the measured-pass count the main loops over — min-of-1 is exactly
    // the round-8 defect (one polluted pass rode the artifact)
    assert(Bench.streamPassCount >= 3,
      "the stream number needs the same min-of-N defense as queries")
    intercept[IllegalArgumentException] { Bench.streamJson(1L, Nil) }
  }

  test("stream_long fragment: BEST of the long-horizon passes rides its " +
      "own key with a passes count beside the min-of-N short passes, and " +
      "is omitted when disabled or when every long pass failed") {
    val withLong = Bench.streamJson(500000L, Seq((3.2, 156250.0)),
      longN = 5000000L,
      longRuns = Seq((41.7, 119904.0), (33.1, 151057.0)))
    val parsed = ujson(s"""{"_":0$withLong}""")
    assert(parsed.contains("stream") && parsed.contains("stream_long"),
      withLong)
    assert(withLong.contains(""""stream_long":{"events":5000000"""),
      withLong)
    // min-seconds pass wins, same defense as the short fragment
    assert(withLong.contains("\"sec\":33.100"), withLong)
    assert(withLong.contains("\"events_per_sec\":151057"), withLong)
    assert(withLong.contains("\"passes\":2"), withLong)
    // short-horizon fields unchanged by the long passes
    assert(withLong.contains("\"stream_passes\":1"), withLong)
    // the main loops the pinned count — one-pass long numbers are the
    // r10 variance defect (766k recorded vs 1.28M clean same-box)
    assert(Bench.longStreamPassCount >= 2,
      "stream_long needs best-of-N, not a single cold pass")
    val without = Bench.streamJson(500000L, Seq((3.2, 156250.0)))
    assert(!without.contains("stream_long"), without)
    val allFailed = Bench.streamJson(500000L, Seq((3.2, 156250.0)),
      longN = 5000000L, longRuns = Nil)
    assert(!allFailed.contains("stream_long"), allFailed)
  }

  test("stream_long_rocksdb fragment: the RocksDB-backed STATEFUL long " +
      "passes ride their own best-of-N key with a passes count, and are " +
      "omitted when disabled or when every pass failed") {
    val j = Bench.streamJson(500000L, Seq((3.2, 156250.0)),
      longN = 5000000L,
      longRuns = Seq((4.0, 1250000.0)),
      rocksLongRuns = Seq((21.4, 233645.0), (18.2, 274725.0)))
    val parsed = ujson(s"""{"_":0$j}""")
    assert(parsed.contains("stream_long_rocksdb"), j)
    assert(j.contains(""""stream_long_rocksdb":{"events":5000000"""), j)
    // best (min-seconds) pass wins, same defense as stream_long
    assert(j.contains("\"sec\":18.200"), j)
    assert(j.contains("\"events_per_sec\":274725"), j)
    // both long fragments coexist, each with its own passes count
    assert(j.contains(""""stream_long":{"events":5000000,"sec":4.000"""), j)
    val without = Bench.streamJson(500000L, Seq((3.2, 156250.0)),
      longN = 5000000L, longRuns = Seq((4.0, 1250000.0)))
    assert(!without.contains("stream_long_rocksdb"), without)
  }

  test("stream-shaped calibration: when the (before, after) pass times " +
      "bracket the section, the fragment carries calibration_stream_* " +
      "keys, a drift-or-absolute stream_load_suspect, and every " +
      "fragment an events_per_sec_normalized = eps x max(1, ratio); " +
      "absent calibration keeps the legacy shape") {
    val runs = Seq((3.2, 156250.0))
    val longRuns = Seq((4.0, 1000000.0))
    // clean host: best pass at the idle floor → ratio 1, normalized ≡ raw
    val clean = Bench.streamJson(500000L, runs, longN = 5000000L,
      longRuns = longRuns, streamCal = Some((1.0, 1.05)), idleRef = 1.0)
    ujson(s"""{"_":0$clean}""")
    assert(clean.contains(
      """"calibration_stream_sec":{"before":1.000,"after":1.050}"""), clean)
    assert(clean.contains(""""calibration_stream_ratio":1.000"""), clean)
    assert(clean.contains(""""stream_load_suspect":false"""), clean)
    assert(clean.contains(""""events_per_sec":156250,""" +
      """"events_per_sec_normalized":156250"""), clean)
    // loaded host: best calibration 2x the floor → fragments normalize
    // UP by 2x and the absolute trigger flags the section
    val loaded = Bench.streamJson(500000L, runs, longN = 5000000L,
      longRuns = longRuns, streamCal = Some((2.0, 2.1)), idleRef = 1.0)
    assert(loaded.contains(""""calibration_stream_ratio":2.000"""), loaded)
    assert(loaded.contains(""""stream_load_suspect":true"""), loaded)
    assert(loaded.contains(""""events_per_sec_normalized":312500"""), loaded)
    assert(loaded.contains(""""events_per_sec":1000000,""" +
      """"events_per_sec_normalized":2000000"""), loaded)
    // drift trigger: before/after >1.3x apart flags even below the floor
    val drifted = Bench.streamJson(500000L, runs,
      streamCal = Some((0.5, 0.9)), idleRef = 1.0)
    assert(drifted.contains(""""stream_load_suspect":true"""), drifted)
    // a FAST host never flatters: ratio < 1 clamps to 1 for normalization
    val fast = Bench.streamJson(500000L, runs,
      streamCal = Some((0.5, 0.5)), idleRef = 1.0)
    assert(fast.contains(""""events_per_sec":156250,""" +
      """"events_per_sec_normalized":156250"""), fast)
    // no calibration → legacy shape, no new keys
    val legacy = Bench.streamJson(500000L, runs)
    assert(!legacy.contains("calibration_stream") &&
      !legacy.contains("events_per_sec_normalized") &&
      !legacy.contains("stream_load_suspect"), legacy)
  }

  test("load guard: >1.3x calibration drift in EITHER direction demands " +
      "a re-run; within-noise drift does not") {
    assert(Bench.loadRerunNeeded(0.5, 0.7), "0.5 -> 0.7 is a loaded host")
    assert(!Bench.loadRerunNeeded(0.5, 0.6), "within-noise drift passes")
    // symmetric: a neighbor present through the PASSES that exits before
    // calAfter shows calibration getting FASTER — the passes were still
    // polluted (the one-sided slower-only guard read this as clean)
    assert(Bench.loadRerunNeeded(0.9, 0.5),
      "a host that got QUIETER mid-run measured its passes under load")
    assert(!Bench.loadRerunNeeded(0.6, 0.5), "within-noise improvement passes")
  }

  test("absolute load guard: a run whose BEST calibration sits >1.3x " +
      "above the idle floor is load_suspect even with zero drift (the " +
      "uniformly-loaded-host gap); at or near the floor it is clean") {
    val idle = Bench.CalibrationIdleRefDefault
    assert(Bench.loadSuspectAbsolute(idle * 1.4, idle),
      "uniformly elevated run must be flagged")
    assert(!Bench.loadSuspectAbsolute(idle * 1.2, idle),
      "within-noise elevation passes")
    assert(!Bench.loadSuspectAbsolute(idle * 0.9, idle),
      "a faster-than-reference host is never suspect")
    // both triggers feed the same flag: drifting AND uniformly-elevated
    // runs are each suspect on their own
    assert(Bench.loadRerunNeeded(idle, idle * 1.4) ||
      Bench.loadSuspectAbsolute(idle, idle))
  }

  test("normalized_total: value divided by the caller's load factor " +
      "rides beside the raw total; absent when no factor is given " +
      "(the factor is clamped >= 1 by the caller, so a fast host " +
      "never flatters the total)") {
    // total = 1.25 + 0.5 + 2.75 = 4.5; factor 1.5 → 3.0
    val j = Bench.resultJson(names, timed, Map.empty, "/sf",
      normalizeBy = Some(1.5))
    assert(j.contains(""""value":4.500"""), j)
    assert(j.contains(""""normalized_total":3.000"""), j)
    val without = Bench.resultJson(names, timed, Map.empty, "/sf")
    assert(!without.contains("normalized_total"), without)
    // a degenerate factor is dropped, never a divide-by-zero
    assert(!Bench.resultJson(names, timed, Map.empty, "/sf",
      normalizeBy = Some(0.0)).contains("normalized_total"))
  }

  test("stream fragments are at least best-of-3: best-of-2 let a 3x " +
      "co-tenant window ride the r12 artifact as 'the' long number " +
      "(both passes landed inside the same contention window)") {
    assert(Bench.streamPassCount >= 3)
    assert(Bench.longStreamPassCount >= 3)
  }

  test("the multi-core calibration floor is positive and the absolute " +
      "guard applies to it the same way") {
    val mcIdle = Bench.CalibrationMcIdleRefDefault
    assert(mcIdle > 0.0)
    assert(Bench.loadSuspectAbsolute(mcIdle * 1.4, mcIdle))
    assert(!Bench.loadSuspectAbsolute(mcIdle * 1.2, mcIdle))
  }

  // minimal structural check without a JSON dependency: braces balance and
  // the string survives a round-trip through Spark's JSON reader
  private def ujson(s: String): String = {
    assert(s.count(_ == '{') == s.count(_ == '}'), s"unbalanced braces: $s")
    s
  }
}
