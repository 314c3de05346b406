package graft

import java.nio.file.{Files, Paths}

/** The round-5 postmortem contract: a query that fails inside Verify must
  * leave a visible trace in the dump directory (errors.json entry plus an
  * _ERROR marker in the query's dir), never silently vanish from the
  * correctness report. Drives Verify.main against a directory with no
  * parquet tables so the selected query fails at read time.
  */
class VerifyMarkersSpec extends SparkSuite {

  test("a failing query writes errors.json and an _ERROR marker; a " +
      "passing run writes an empty errors.json") {
    val emptySf = tmpDir("verify-badsf")
    val outBad = tmpDir("verify-out-bad")
    Verify.run(spark, emptySf, outBad, Set("a01_tumbling_window"))
    val errJson = Files.readString(Paths.get(s"$outBad/errors.json"))
    assert(errJson.contains("a01_tumbling_window"), s"errors.json: $errJson")
    assert(Files.exists(Paths.get(s"$outBad/a01_tumbling_window/_ERROR")))
    // oracle_sql.json still written so the driver's compare can proceed
    assert(Files.exists(Paths.get(s"$outBad/oracle_sql.json")))

    val outGood = tmpDir("verify-out-good")
    Verify.run(spark, sf0001, outGood, Set("q02_agg_pricing"))
    assert(Files.readString(Paths.get(s"$outGood/errors.json")) == "{}")
    assert(!Files.exists(Paths.get(s"$outGood/q02_agg_pricing/_ERROR")))
    assert(Files.list(Paths.get(s"$outGood/q02_agg_pricing"))
      .anyMatch(p => p.toString.endsWith(".parquet")))
  }

  test("a REUSED outDir cannot mask a newly broken query with last " +
      "round's parquet: the failure path clears stale part-files before " +
      "writing _ERROR (a driver globbing <name>/*.parquet would read the " +
      "stale-but-correct rows and pass a query that no longer runs)") {
    val out = tmpDir("verify-out-reuse")
    // round N: the query dumps successfully
    Verify.run(spark, sf0001, out, Set("q02_agg_pricing"))
    assert(Files.list(Paths.get(s"$out/q02_agg_pricing"))
      .anyMatch(p => p.toString.endsWith(".parquet")))
    // round N+1 reuses the SAME outDir and the query now fails
    val emptySf = tmpDir("verify-badsf2")
    Verify.run(spark, emptySf, out, Set("q02_agg_pricing"))
    assert(Files.exists(Paths.get(s"$out/q02_agg_pricing/_ERROR")))
    assert(!Files.list(Paths.get(s"$out/q02_agg_pricing"))
      .anyMatch(p => p.toString.endsWith(".parquet")),
      "stale parquet must be cleared alongside the _ERROR marker")
  }
}
