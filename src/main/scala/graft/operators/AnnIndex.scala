package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Parquet-backed persistent ANN index store — the build-once/probe-many
  * half of the production similarity-search story. s03/s07 prove the IVF
  * math but rebuild the whole index (centroid sampling + corpus
  * assignment) inside every query; a 100 TB deployment builds the index
  * once (one O(N·k) pass), persists it, and serves many probe batches
  * against the artifact. This store holds the two IVF support structures:
  *
  *  - `centroids`: the coarse quantizer (k rows — tiny; probes broadcast it)
  *  - `postings`: the inverted lists — one row per corpus vector
  *    (vec_id, vd, nrm), written PARTITIONED BY `cell` so a probe that
  *    touches nprobe cells prunes the scan to those partitions (static
  *    pruning for literal cell predicates; dynamic partition pruning
  *    under the broadcast probe join).
  *
  * Versioned layout (the UpsertSink manifest-plus-pointer discipline,
  * UpsertSink.scala — readers resolve a pointer, so a crash mid-build
  * never exposes a half-written index):
  *
  * {{{
  *   indexDir/v<N>/centroids/         (parquet files)
  *   indexDir/v<N>/postings/cell=<id>/ (parquet files)
  *   indexDir/v<N>/_manifest.json   written LAST inside the version
  *   indexDir/_current              pointer "v<N>"; tmp + ATOMIC_MOVE flip
  * }}}
  *
  * [[publish]] writes the next version dir, its manifest, then flips the
  * pointer atomically; [[load]] resolves the pointer and REQUIRES the
  * manifest (a version dir without one is a crashed build, and the
  * pointer still names the previous good version). Orphaned version dirs
  * are reclaimed by [[vacuum]]. Single-writer per indexDir by convention
  * (the same convention every scratch/sink in this repo uses); publishes
  * within one JVM additionally serialize on a per-dir lock so two
  * concurrent builders cannot mint the same version number.
  */
object AnnIndex {

  /** A loaded index version: `centroids` is k rows (broadcast it),
    * `postings` one row per indexed vector, `cell` restored to LONG
    * (partition-column inference would otherwise narrow small ids). */
  final case class Handle(version: String, k: Int,
      centroids: DataFrame, postings: DataFrame)

  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    publishLocks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.normalize.toString, _ => new Object)

  private def pointerPath(indexDir: String): Path =
    Paths.get(indexDir, "_current")

  private val VersionName = "^v(\\d+)$".r

  /** The committed version named by the pointer, if any. */
  def currentVersion(indexDir: String): Option[String] = {
    val p = pointerPath(indexDir)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
      .filter(v => VersionName.findFirstIn(v).isDefined)
  }

  /** Highest version number present ON DISK (committed or orphaned) — the
    * next publish must clear BOTH: minting from the pointer alone would
    * re-enter an orphaned dir a crashed build left behind. */
  private def maxVersionOnDisk(indexDir: String): Long = {
    val d = Paths.get(indexDir)
    if (!Files.exists(d)) 0L
    else {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.flatMap(p =>
          VersionName.findFirstMatchIn(p.getFileName.toString)
            .map(_.group(1).toLong))
          .foldLeft(0L)(math.max)
      } finally s.close()
    }
  }

  /** Build a new index version from the support frames and commit it.
    * `centroids` must carry (cent_id, cv, cn); `postings`
    * (vec_id, vd, nrm, cell). Returns the committed version name. The
    * manifest records k and both row counts (the centroid count doubles
    * as the integrity check load applies). */
  def publish(centroids: DataFrame, postings: DataFrame,
      indexDir: String, k: Int): String = lockFor(indexDir).synchronized {
    require(k > 0, s"centroid count k must be positive, got $k")
    Files.createDirectories(Paths.get(indexDir))
    val version = s"v${maxVersionOnDisk(indexDir) + 1}"
    val vdir = s"$indexDir/$version"
    centroids.write.mode("overwrite").parquet(s"$vdir/centroids")
    postings.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$vdir/postings")
    val spark = centroids.sparkSession
    // metadata-only parquet counts: cheap at any scale
    val nCents = spark.read.parquet(s"$vdir/centroids").count()
    val nPosts = spark.read.parquet(s"$vdir/postings").count()
    val manifest =
      s"""{"k":$k,"centroids":$nCents,"postings":$nPosts}"""
    Files.write(Paths.get(vdir, "_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // atomic pointer flip: write beside, move over — a crash before the
    // move leaves the old pointer; after it, the new version is complete
    // (its manifest was written above)
    val tmp = Paths.get(indexDir, s"._current.$version.tmp")
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(indexDir),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    version
  }

  private def manifestField(json: String, field: String): Option[Long] =
    s""""$field"\\s*:\\s*(\\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toLong)

  /** Load the committed version. Fails loudly when no pointer exists,
    * when the pointed-at version lacks its manifest (a crashed build the
    * pointer should never name), or when the centroid count on disk
    * disagrees with the manifest. */
  def load(spark: SparkSession, indexDir: String): Handle = {
    val version = currentVersion(indexDir).getOrElse(throw
      new IllegalStateException(
        s"no committed ANN index at $indexDir (missing/invalid _current " +
          "pointer): publish one first"))
    val vdir = s"$indexDir/$version"
    val mPath = Paths.get(vdir, "_manifest.json")
    require(Files.exists(mPath),
      s"ANN index $indexDir/$version has no manifest — the pointer names " +
        "an incomplete build; republish")
    val m = new String(Files.readAllBytes(mPath), StandardCharsets.UTF_8)
    val k = manifestField(m, "k").getOrElse(throw new IllegalStateException(
      s"ANN index manifest at $vdir is malformed: $m")).toInt
    val centroids = spark.read.parquet(s"$vdir/centroids")
    val expected = manifestField(m, "centroids")
    val actual = centroids.count()
    require(expected.forall(_ == actual),
      s"ANN index $vdir: manifest records ${expected.get} centroids, " +
        s"disk has $actual — corrupt version; republish")
    val postings = spark.read.parquet(s"$vdir/postings")
      .withColumn("cell", col("cell").cast("long"))
    Handle(version, k, centroids, postings)
  }

  /** Drop version dirs that are neither current nor among the `keep`
    * most recent COMMITTED predecessors (dirs carrying a manifest below
    * the pointer — the rollback targets). Orphans from crashed builds —
    * manifest-less dirs, and anything numbered above the pointer — are
    * always reclaimed: load can never read them, so "keeping" one is
    * pure debris. Counting committed versions, not version NUMBERS,
    * matters under gapped numbering: v1,v2 committed + v3 orphaned + v4
    * committed must keep v2 (the only rollback target) under keep=1,
    * not retain the useless v3 while deleting v2. Never touches the
    * current version or the pointer. */
  def vacuum(indexDir: String, keep: Int = 1): Unit =
    lockFor(indexDir).synchronized {
      val currentNum = currentVersion(indexDir).flatMap(v =>
        VersionName.findFirstMatchIn(v).map(_.group(1).toLong))
      val d = Paths.get(indexDir)
      if (Files.exists(d) && currentNum.isDefined) {
        val s = Files.list(d)
        val versions = try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.flatMap { p =>
            VersionName.findFirstMatchIn(p.getFileName.toString)
              .map(m => m.group(1).toLong -> p)
          }.toSeq
        } finally s.close()
        val committedBelow = versions.collect {
          case (n, p) if n < currentNum.get &&
            Files.exists(p.resolve("_manifest.json")) => n
        }.sorted.takeRight(math.max(keep, 0)).toSet
        versions.foreach { case (n, p) =>
          if (n != currentNum.get && !committedBelow.contains(n))
            deleteTree(p)
        }
      }
    }

  private def deleteTree(p: Path): Unit =
    graft.FsTree.delete(p, bestEffort = true)
}
