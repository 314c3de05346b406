package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The corpus has no real image/audio bytes, so the declared query treats the
  * document text's UTF-8 encoding as the opaque blob (deterministic, oracle-
  * reproducible) and derives metadata the way a decode stage would (byte
  * length, fake dimensions, leading magic byte). The *real* Spark plumbing —
  * a typed `MediaRecord` schema, partition-wise batch decode via
  * mapPartitions with a clearly-marked stub decoder — is in
  * [[graft.streaming.MediaPipeline]] with its own spec; this query gates the
  * column-level semantics in the oracle.
  */
object MultimodalOps {

  private def m01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        (octet_length(col("blob")) % 640).cast("long").as("fake_width"),
        ((octet_length(col("blob")) * 7) % 480).cast("long").as("fake_height"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("magic_byte"),
        lit(3L).as("channels"))
      .orderBy(col("doc_id"))

  private val m01Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS fake_height,
      |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS magic_byte,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "m01_multimodal_meta" -> QueryDef(m01, Some(m01Sql)),
  )
}
