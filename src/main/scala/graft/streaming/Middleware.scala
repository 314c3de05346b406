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
  *  - M1 protobuf (middleware/default.clj:36-85)   → [[proto]], a
  *    descriptor-driven wire-format decoder (graft.functions.ProtoWire) —
  *    no protobuf-java dependency; on a cluster with spark-protobuf the
  *    same slot takes `from_protobuf(col("value"), name, descFile)`.
  *  - M2 google.protobuf.Struct flatten (default.clj:9-34) →
  *    [[protoStruct]]: Struct wire bytes → JSON column (Value is
  *    recursively dynamic, which a static schema cannot hold; JSON is the
  *    Spark-idiomatic carrier — query via get_json_object/from_json).
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
    // NOT Spark's default "_corrupt_record": the detector field is part
    // of the parse schema, so a VALID payload that happens to carry a
    // literal key of the same name would populate it from the data and
    // be dead-lettered. The graft-prefixed name makes that collision
    // require a producer deliberately spoofing engine internals.
    val corruptCol = "_graft_corrupt_record_1f2e"
    val s2 = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    df.withColumn("message",
        from_json(col("value").cast("string"), s2,
          options + ("columnNameOfCorruptRecord" -> corruptCol)))
      .withColumn("message",
        when(col(s"message.$corruptCol").isNull,
          col("message").dropFields(corruptCol)))
  }

  /** M1 protobuf middleware: value wire bytes → typed struct column
    * `message` per the descriptor (the reference's proto→map default,
    * middleware/default.clj:36-85). Malformed bytes → null `message`,
    * routed by [[splitCorrupt]] with the raw payload preserved (E9). */
  def proto(msg: graft.functions.ProtoWire.ProtoMessage)(
      df: DataFrame): DataFrame =
    df.withColumn("message",
      graft.functions.ProtoFunctions.protoDecode(col("value"), msg))

  /** M2 Struct middleware: `google.protobuf.Struct` value bytes → JSON
    * string column `message_json` (the proto-Struct flatten,
    * middleware/default.clj:9-34). */
  def protoStruct(df: DataFrame): DataFrame =
    df.withColumn("message_json",
      graft.functions.ProtoFunctions.protoStructJson(col("value")))

  /** True when the spark-protobuf module is on the classpath (it is an
    * optional Spark module — `--packages org.apache.spark:spark-protobuf`).
    * Note: spark-sql-api ships the `functions` FACADE unconditionally; the
    * decode implementation (ProtobufDataToCatalyst) only arrives with the
    * module, so that is the class the probe must check. */
  lazy val hasSparkProtobuf: Boolean =
    try {
      Class.forName("org.apache.spark.sql.protobuf.ProtobufDataToCatalyst")
      true
    } catch { case _: Throwable => false }

  /** M1 native path: `from_protobuf(value, messageName, descFile)` resolved
    * reflectively so this compiles (and fails with a clear message) without
    * the optional spark-protobuf module. On clusters that ship it, prefer
    * this over [[proto]] for full .proto-language coverage (oneof, maps,
    * sint/fixed variants, well-known types); the downstream contract —
    * struct column `message`, null on corrupt via PERMISSIVE mode — is
    * identical, so routes swap decoders without change. */
  def protoNative(messageName: String, descriptorFilePath: String)(
      df: DataFrame): DataFrame = {
    if (!hasSparkProtobuf)
      throw new IllegalStateException(
        "spark-protobuf is not on the classpath; add the " +
          "org.apache.spark:spark-protobuf module or use Middleware.proto " +
          "(the built-in descriptor-driven wire codec)")
    val fns = Class.forName("org.apache.spark.sql.protobuf.functions$")
    val module = fns.getField("MODULE$").get(null)
    val m = fns.getMethod("from_protobuf",
      classOf[Column], classOf[String], classOf[String],
      classOf[java.util.Map[String, String]])
    val opts = new java.util.HashMap[String, String]()
    opts.put("mode", "PERMISSIVE") // corrupt → null message, E9 contract
    val decoded = m.invoke(module, col("value"), messageName,
      descriptorFilePath, opts).asInstanceOf[Column]
    df.withColumn("message", decoded)
  }

  /** E9: split (parsed, corrupt). Corrupt rows keep their raw `value` bytes
    * so the DLQ holds the original payload, exactly like the reference
    * publishing the still-serialized payload (messaging/consumer.clj:28-48).
    * `parsedCol` names the decoder's output column: "message" for
    * [[json]]/[[proto]], "message_json" for [[protoStruct]] (M2) — the
    * old hard-coded "message" made the documented
    * `splitCorrupt(protoStruct(df))` composition fail with an
    * unresolved-column error, leaving M2 corrupt rows no DLQ route. */
  def splitCorrupt(df: DataFrame,
      parsedCol: String = "message"): (DataFrame, DataFrame) =
    (df.filter(col(parsedCol).isNotNull),
      df.filter(col(parsedCol).isNull).drop(parsedCol))
}
