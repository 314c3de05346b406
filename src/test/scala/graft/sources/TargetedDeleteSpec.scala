package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Targeted key deletion over the key-bucketed layout: only the buckets
  * containing delete keys rewrite; every other bucket's files stay
  * byte-identical (the I/O contract that makes point deletes O(k/buckets)
  * of the table instead of a full rewrite). */
class TargetedDeleteSpec extends SparkSuite {

  private def bucketFiles(root: String): Map[String, Map[String, Array[Byte]]] =
    Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("__bucket="))
      .map { dir =>
        dir.getFileName.toString ->
          Files.list(dir).iterator().asScala
            .filter(f => f.getFileName.toString.startsWith("part-"))
            .map(f => f.getFileName.toString -> Files.readAllBytes(f))
            .toMap
      }.toMap

  test("deleteKeys rewrites only hit buckets; untouched buckets are " +
      "byte-identical; surviving content is the exact anti-join") {
    val path = s"${tmpDir("graft-tdel")}/events_b"
    val ev = Tables(spark, sf0001).events
    Formats.writeKeyBucketed(ev, path, "user_id", buckets = 8)
    val before = bucketFiles(path)

    val delUsers = Seq(0L, 1L)
    val sess = spark
    import sess.implicits._
    val delKeys = delUsers.toDF("user_id")
    val hitBuckets = delKeys
      .select(pmod(hash(col("user_id")), lit(8)).as("b"))
      .distinct().collect().map(r => s"__bucket=${r.getInt(0)}").toSet

    val expectedDeleted =
      ev.filter(col("user_id").isin(delUsers.map(Long.box): _*)).count()
    val deleted = Formats.deleteKeys(spark, path, "user_id", delKeys, 8)
    assert(deleted == expectedDeleted && deleted > 0,
      s"deleted=$deleted expected=$expectedDeleted")

    val after = bucketFiles(path)
    // untouched buckets: identical file names AND identical bytes
    (before.keySet -- hitBuckets).foreach { b =>
      assert(after.contains(b), s"untouched $b vanished")
      assert(after(b).keySet == before(b).keySet,
        s"untouched $b file set changed")
      before(b).foreach { case (f, bytes) =>
        assert(java.util.Arrays.equals(after(b)(f), bytes),
          s"untouched $b/$f bytes changed")
      }
    }
    // surviving rows = exact anti-join of the original
    val got = spark.read.parquet(path).select(col("event_id"))
      .collect().map(_.getLong(0)).toSet
    val want = ev.filter(!col("user_id").isin(delUsers.map(Long.box): _*))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(got == want, "surviving content diverged from anti-join")
  }

  test("deleting every key of a bucket removes its directory") {
    val path = s"${tmpDir("graft-tdel2")}/events_b"
    val ev = Tables(spark, sf0001).events
    Formats.writeKeyBucketed(ev, path, "user_id", buckets = 8)
    // delete ALL users → every bucket empties and disappears
    val allUsers = ev.select(col("user_id")).distinct()
    val deleted = Formats.deleteKeys(spark, path, "user_id", allUsers, 8)
    assert(deleted == ev.count())
    assert(bucketFiles(path).isEmpty, "emptied bucket dirs must be removed")
  }
}
