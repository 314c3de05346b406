package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSuite {

  test("documents round-trip identically through parquet, csv, orc, and json") {
    val docs = Tables(spark, sf0001).documents
    val schema = docs.schema
    val base = tmpDir("formats")
    Formats.writeParquet(docs, s"$base/p")
    Formats.writeCsv(docs, s"$base/c")
    Formats.writeJsonLines(docs, s"$base/j")
    Formats.writeOrc(docs, s"$base/o")
    val fromP = Formats.readParquet(spark, s"$base/p", schema)
    val fromC = Formats.readCsv(spark, s"$base/c", schema)
    val fromJ = Formats.readJsonLines(spark, s"$base/j", schema)
    val fromO = Formats.readOrc(spark, s"$base/o", schema)
    assert(fromP.exceptAll(docs).isEmpty && docs.exceptAll(fromP).isEmpty)
    assert(fromC.exceptAll(docs).isEmpty && docs.exceptAll(fromC).isEmpty)
    assert(fromJ.exceptAll(docs).isEmpty && docs.exceptAll(fromJ).isEmpty)
    assert(fromO.exceptAll(docs).isEmpty && docs.exceptAll(fromO).isEmpty)
  }

  test("envelope export/import preserves binary payloads via base64") {
    val env = envelopes("app", Seq(
      ("k1", "payload-1", ts("2024-01-01 00:00:00")),
      ("k2", "payload-é中", ts("2024-01-02 00:00:00"))))
    val base = tmpDir("envdump")
    Formats.exportEnvelopes(env, s"$base/dump")
    val back = Formats.importEnvelopes(spark, s"$base/dump")
    assert(back.count() == 2)
    val vals = back.select(col("value").cast("string")).collect()
      .map(_.getString(0)).sorted
    assert(vals.toSeq == Seq("payload-1", "payload-é中"))
    assert(back.schema == graft.streaming.Envelope.schema)
  }

  test("partitioned layout prunes at planning: a lang filter reads only " +
      "that partition's files") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val base = tmpDir("partlayout")
    Formats.writePartitioned(docs, s"$base/bylang", Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "need several partitions for the pruning proof")
    val q = spark.read.parquet(s"$base/bylang").filter(col("lang") === "en")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition filter in scan:\n$plan")
    // only the lang=en directory's file is read (inputFiles reports the
    // pre-pruning relation, so probe the scan's executed metrics instead)
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = spark.read.parquet(s"$base/bylang").inputFiles.length
    assert(filesRead < totalFiles,
      s"pruning failed: read $filesRead of $totalFiles files")
    // and the pruned read returns exactly the filtered rows
    assert(q.count() == docs.filter(col("lang") === "en").count())
  }
}
