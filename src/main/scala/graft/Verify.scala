package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional extra args: restrict the dump to the named queries (local
    // iteration); the driver's 2-arg invocation dumps everything.
    val only = args.drop(2).toSet
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).getOrElse(4)
    // canonical builder: the hand-rolled copy here ran WITHOUT AQE, so
    // correctness dumps executed different physical plans than Bench
    // timed — results were identical (values, not plans, are compared),
    // but the drift class is exactly what one builder prevents
    val spark = GraftSession.build("graft-verify", s"local[$cpus]", cpus)
    run(spark, sfDir, outDir, only)
    // exit 0 even with failures: the driver must still run the DuckDB
    // compare over the successful dumps — the markers carry the bad news.
    spark.stop()
  }

  /** The dump pass, session-owned-by-caller (VerifyMarkersSpec drives the
    * failure path against the shared test session). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    // A failed query must SURFACE in the correctness report, not vanish:
    // round 5's events-schema break was masked because failures here left
    // no trace in the dump dir. Record each failure (a) in errors.json and
    // (b) as an _ERROR marker inside the query's otherwise-empty dump dir,
    // so a driver that globs <name>/*.parquet reads nothing and reports
    // err != null instead of silently dropping the query.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg.linesIterator.take(3).mkString(" ").take(500)
        System.err.println(s"[verify] $name FAILED: ${errors(name)}")
        val d = new java.io.File(s"$outDir/$name")
        // clear STALE parquet first: a reused outDir whose previous run
        // dumped this query successfully would otherwise keep last
        // run's part-files BESIDE the new _ERROR marker — a driver that
        // globs <name>/*.parquet then reads stale-but-correct rows and
        // passes a query that no longer runs (the exact masking this
        // error path exists to prevent)
        if (d.isDirectory)
          Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
            try {
              if (f.isDirectory) {
                Option(f.listFiles()).getOrElse(Array.empty)
                  .foreach(g => g.delete())
              }
              f.delete()
            } catch { case scala.util.control.NonFatal(_) => () }
          }
        d.mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR"), errors(name))
      }
      // several builders cache a multi-consumer intermediate (p08, d02,
      // d14, …); each build creates fresh lineage, so without eviction a
      // full dump accumulates a cached copy per query until LRU pressure.
      // The cache only has value within one query's write — drop it here.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
  }
}
