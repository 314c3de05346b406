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
}
