package graft.operators

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Scratch-root reaping (LayoutOps): dead-pid roots are reclaimed, but
  * only once they have sat untouched past the age threshold — liveness
  * via ProcessHandle only sees the current pid namespace, so a sibling
  * container sharing the tmpdir has LIVE roots whose pids parse as dead
  * here; the age gate bounds that race to abandoned roots. */
class ScratchReapSpec extends AnyFunSuite {

  private def withBase(f: Path => Unit): Unit = {
    val base = Files.createTempDirectory("graft-reap-spec")
    try f(base)
    finally {
      import scala.jdk.CollectionConverters._
      Files.walk(base).sorted(
        java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
  }

  private def mkRoot(base: Path, name: String): Path = {
    val p = Files.createDirectory(base.resolve(name))
    Files.writeString(p.resolve("part-0.parquet"), "x")
    p
  }

  // a pid that cannot be alive in this namespace (kernel pid_max is
  // 4194304 by default; 2^62 is unreachable and still parses as Long)
  private val deadPid = (1L << 62).toString

  test("a dead-pid root is reaped only once OLDER than the age " +
      "threshold — a fresh root (live sibling namespace's reader, or a " +
      "just-exited process) survives the sweep") {
    withBase { base =>
      val fresh = mkRoot(base, s"zorder-abc-p$deadPid")
      LayoutOps.reapDeadRoots(base)
      assert(Files.exists(fresh),
        "a just-written dead-pid root must survive (cross-namespace race)")
      // advance the clock past the threshold instead of waiting
      LayoutOps.reapDeadRoots(base,
        now = System.currentTimeMillis() + LayoutOps.ReapMinAgeMillis + 1000)
      assert(!Files.exists(fresh),
        "an abandoned dead-pid root past the age gate must be reclaimed")
    }
  }

  test("a live-pid root is NEVER reaped, at any age; legacy unsuffixed " +
      "roots follow the same age gate") {
    withBase { base =>
      val own = mkRoot(base,
        s"compact-def-p${ProcessHandle.current().pid()}")
      val legacy = mkRoot(base, "zorder-legacy-fixed")
      val future = System.currentTimeMillis() + LayoutOps.ReapMinAgeMillis * 48
      LayoutOps.reapDeadRoots(base, now = future)
      assert(Files.exists(own), "the owning process's root is untouchable")
      assert(!Files.exists(legacy),
        "an aged legacy fixed-path root has no possible owner")
    }
  }
}
