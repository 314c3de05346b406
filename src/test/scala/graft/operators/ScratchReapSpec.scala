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

  test("the age gate reads the NEWEST mtime anywhere in the tree: a " +
      "dead-pid root whose nested part file was written recently " +
      "survives even when the root directory itself is old") {
    withBase { base =>
      val root = mkRoot(base, s"zorder-deep-p$deadPid")
      val sub = Files.createDirectory(root.resolve("events_z"))
      val part = Files.writeString(sub.resolve("part-1.parquet"), "y")
      val future =
        System.currentTimeMillis() + LayoutOps.ReapMinAgeMillis + 60000
      // the nested write is fresh on the reap clock; everything else
      // (root dir, sibling file) is a full window old
      Files.setLastModifiedTime(part,
        java.nio.file.attribute.FileTime.fromMillis(future - 1000))
      LayoutOps.reapDeadRoots(base, now = future)
      assert(Files.exists(root),
        "an actively-written tree must survive whatever the root " +
          "directory's own mtime says")
      // once the nested write also ages out, the root is reclaimed
      LayoutOps.reapDeadRoots(base,
        now = future + LayoutOps.ReapMinAgeMillis + 1000)
      assert(!Files.exists(root))
    }
  }

  test("a fresh reader HEARTBEAT protects a dead-pid root past the age " +
      "gate (the cross-namespace lazy-reader race); a silent twin is " +
      "reaped in the same sweep") {
    withBase { base =>
      val beating = mkRoot(base, s"zorder-hb-p$deadPid")
      val silent = mkRoot(base, s"zorder-sil-p$deadPid")
      val future =
        System.currentTimeMillis() + LayoutOps.ReapMinAgeMillis + 60000
      val hb = Files.write(beating.resolve(LayoutOps.HeartbeatName),
        Array.empty[Byte])
      Files.setLastModifiedTime(hb,
        java.nio.file.attribute.FileTime.fromMillis(future - 1000))
      LayoutOps.reapDeadRoots(base, now = future)
      assert(Files.exists(beating),
        "a root whose owner still heartbeats must survive")
      assert(!Files.exists(silent),
        "the heartbeat-less twin past the gate must be reclaimed")
    }
  }

  test("the owner daemon touches every registered root's heartbeat at " +
      "a bounded frequency and drops vanished roots from the set") {
    withBase { base =>
      val root = Files.createDirectory(base.resolve("hb-owner-p1"))
      LayoutOps.registerHeartbeat(root)
      val hb = root.resolve(LayoutOps.HeartbeatName)
      assert(Files.exists(hb), "registration must write the first beat")
      val t0 = Files.getLastModifiedTime(hb).toMillis
      LayoutOps.touchHeartbeats()
      assert(Files.getLastModifiedTime(hb).toMillis >= t0)
      assert(LayoutOps.heartbeatPeriodMs <= LayoutOps.ReapMinAgeMillis / 4,
        "the touch period must sit well inside the reap window")
      // a vanished root is dropped, and the sweep stays exception-free
      import scala.jdk.CollectionConverters._
      Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      LayoutOps.touchHeartbeats()
      assert(!Files.exists(hb))
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
