package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The preflight ring's durable half: append-on-record JSONL spill,
  * size-capped by one rotation generation, reloadable after a driver
  * restart. The ring is JVM-global and other suites may interleave
  * entries, so every assertion here keys on this suite's own unique
  * markers rather than ring counts. */
class PreflightSpillSpec extends AnyFunSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Register `path` and record a marker line, retrying if another
    * suite's engine construction re-pointed the JVM-global spill in the
    * window (sub-ms, but suites run concurrently). */
  private def recordWithSpill(path: String, marker: String,
      aborted: Boolean = false, shareBp: Option[Long] = None): Unit = {
    var attempts = 0
    var ok = false
    while (!ok && attempts < 5) {
      PreflightLog.clearSpill()
      PreflightLog.spillTo(path)
      // the LINE carries JSON-hostile characters; the marker stays clean
      // so the on-disk (escaped) rendering still contains it verbatim
      PreflightLog.record(
        s"test preflight: \"quoted\"\nnewline worst_element=$marker",
        aborted = aborted, rule = "overlap-join", kind = "preflight",
        diagnosis = "hot-element: test", worstKey = s"worst_element=$marker",
        shareBp = shareBp)
      val p = Paths.get(path)
      ok = Files.exists(p) && new String(Files.readAllBytes(p)).contains(marker)
      attempts += 1
    }
    assert(ok, s"spill append never landed for marker $marker")
  }

  test("append-on-record + reload round-trips every typed field, " +
      "including JSON-hostile characters in the line") {
    val path = s"${tmp("pfspill")}/ckpt/_preflight_spill.jsonl"
    try {
      val marker = "m-" + System.nanoTime()
      recordWithSpill(path, marker, aborted = true, shareBp = Some(10000L))
      val before = PreflightLog.recent()
        .find(_.worstKey.contains(marker)).get
      // simulated restart: the ring dies with the driver
      PreflightLog.clear()
      assert(!PreflightLog.recent().exists(_.worstKey.contains(marker)))
      assert(PreflightLog.loadSpill() >= 1)
      val after = PreflightLog.recent()
        .find(_.worstKey.contains(marker))
      assert(after.isDefined, "reload must resurrect the audit")
      assert(after.get == before,
        s"reloaded audit must be field-identical:\n $before\n ${after.get}")
    } finally PreflightLog.clearSpill()
  }

  test("the spill is size-capped: one rotation generation bounds disk " +
      "at ~2x maxBytes, and reload seeds at most Capacity newest") {
    val path = s"${tmp("pfspill2")}/spill.jsonl"
    try {
      PreflightLog.clearSpill()
      PreflightLog.spillTo(path, maxBytes = 4096L)
      (1 to 200).foreach { i =>
        PreflightLog.record(s"test preflight line $i " + "x" * 150,
          aborted = false, rule = "overlap-join", kind = "preflight",
          diagnosis = "ok")
      }
      val p = Paths.get(path)
      val r = Paths.get(path + ".1")
      assert(Files.exists(p) && Files.exists(r),
        "200 ~200-byte lines past a 4KB cap must have rotated")
      val total = Files.size(p) + Files.size(r)
      assert(total < 3 * 4096L, s"disk use must stay bounded, got $total")
      PreflightLog.clear()
      assert(PreflightLog.loadSpill() <= PreflightLog.Capacity)
    } finally PreflightLog.clearSpill()
  }

  test("malformed spill lines are skipped, valid ones load") {
    val dir = tmp("pfspill3")
    val path = s"$dir/spill.jsonl"
    val marker = "mm-" + System.nanoTime()
    val valid = PreflightLog.toJson(PreflightLog.Audit(
      42L, "ln", aborted = false, rule = "overlap-join",
      kind = "preflight", diagnosis = "ok", worstKey = s"k=$marker",
      shareBp = None, session = "s1"))
    Files.write(Paths.get(path),
      s"not json at all\n{\"at\":broken}\n$valid\n".getBytes)
    try {
      PreflightLog.clearSpill()
      PreflightLog.spillTo(path)
      PreflightLog.clear()
      assert(PreflightLog.loadSpill() == 1)
      val got = PreflightLog.recent().find(_.worstKey.contains(marker))
      assert(got.exists(a => a.atMillis == 42L && a.session == "s1"), got)
    } finally PreflightLog.clearSpill()
  }
}
