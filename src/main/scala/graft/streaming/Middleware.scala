package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Deserialization middleware — the engine's extension point, mirroring the
  * reference's handler-wrapping middleware (SURVEY.md §2.8) but expressed as
  * column transforms so deserialization is vectorized/codegen'd rather than
  * per-message:
  *
  *  - M3 JSON (middleware/json.clj:12-50)          → from_json
  *  - M1 protobuf (middleware/default.clj:36-85)   → from_protobuf when the
  *    spark-protobuf module is on the classpath; this container ships
  *    without it, so [[protoStub]] documents the wiring with a
  *    deterministic length-prefixed stub codec that exercises the identical
  *    plumbing (binary value → typed struct column + corrupt-row null path).
  *  - E9 deserialization-failure DLQ: parse failures yield null structs;
  *    [[splitCorrupt]] routes them with the raw bytes preserved.
  */
object Middleware {

  /** JSON middleware: value bytes → typed struct column `message`. Parse
    * failures → null `message` (routed by [[splitCorrupt]]). PERMISSIVE mode
    * yields an all-null struct for malformed input, so corruption is
    * detected via the standard corrupt-record column and nulled out. */
  def json(schema: StructType, options: Map[String, String] = Map.empty)(
      df: DataFrame): DataFrame = {
    val corruptCol = "_corrupt_record"
    val s2 = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    df.withColumn("message",
        from_json(col("value").cast("string"), s2,
          options + ("columnNameOfCorruptRecord" -> corruptCol)))
      .withColumn("message",
        when(col(s"message.$corruptCol").isNull,
          col("message").dropFields(corruptCol)))
  }

  /** Stub "protobuf" middleware: decodes the deterministic fake codec
    * `id:int32-BE | pathLen:int32-BE | path:utf8` into struct(id, path) —
    * the same shape as the reference's golden Example.Photo fixture
    * (FIXTURES.md §2). On a real cluster replace the decoder expression with
    * `from_protobuf(col("value"), messageName, descriptorFile)`; everything
    * downstream (null-on-corrupt, dispatch, retry) is codec-agnostic. */
  def protoStub(df: DataFrame): DataFrame = {
    val id = expr(
      """CASE WHEN length(value) >= 8 THEN
        |  CAST(conv(hex(substring(value, 1, 4)), 16, 10) AS INT)
        |END""".stripMargin)
    val pathLen = expr(
      """CASE WHEN length(value) >= 8 THEN
        |  CAST(conv(hex(substring(value, 5, 4)), 16, 10) AS INT)
        |END""".stripMargin)
    df.withColumn("message",
      when(col("value").isNotNull && length(col("value")) >= 8
          && pathLen === length(col("value")) - 8,
        struct(id.as("id"),
          expr("CAST(substring(value, 9, length(value) - 8) AS STRING)")
            .as("path"))))
  }

  /** Scala-side encoder for the stub codec (used by specs to produce
    * "proto" payloads). */
  def encodeStub(id: Int, path: String): Array[Byte] = {
    val pathBytes = path.getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(8 + pathBytes.length)
    bb.putInt(id).putInt(pathBytes.length).put(pathBytes)
    bb.array()
  }

  /** E9: split (parsed, corrupt). Corrupt rows keep their raw `value` bytes
    * so the DLQ holds the original payload, exactly like the reference
    * publishing the still-serialized payload (messaging/consumer.clj:28-48). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("message").isNotNull),
      df.filter(col("message").isNull).drop("message"))
}
