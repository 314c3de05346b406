package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PipelineSpec extends SparkSuite {

  test("too-old filter drops records beyond the cutoff (R2)") {
    val batch = envelopes("app", Seq(
      ("fresh", "v1", ts("2024-01-30 00:00:00")),
      ("stale", "v2", ts("2024-01-01 00:00:00"))))
    val out = Pipeline.tooOldFilter(7 * 86400,
      now = lit("2024-01-31 00:00:00").cast("timestamp"))(batch).collect()
    assert(out.length == 1)
    assert(new String(out(0).getAs[Array[Byte]]("key")) == "fresh")
  }

  test("metadata enrichment carries topic/timestamp/partition/retry (R3); " +
      "rabbitmq_retry_count counts HOPS TAKEN (configured − remaining), " +
      "the same contract userPayload implements") {
    val batch = envelopes("app", Seq(("k", "v", ts("2024-01-01 00:00:00"))))
    val row = Pipeline.enrichMetadata(batch).select("metadata.*").collect()(0)
    assert(row.getAs[String]("topic") == "app")
    assert(row.getAs[Int]("partition") == 0)
    assert(row.getAs[java.sql.Timestamp]("timestamp") == ts("2024-01-01 00:00:00"))
    // 3 remaining of 5 configured = 2 hops taken; first delivery = 0 —
    // NOT the raw remaining count (a handler dead-lettering at
    // rabbitmq_retry_count >= 3 would otherwise fire on the FIRST hop)
    val hop = Pipeline.enrichMetadata(
        batch.withColumn("retryCount", lit(3)), configuredRetryCount = 5)
      .select("metadata.*").collect()(0)
    assert(hop.getAs[Int]("rabbitmq_retry_count") == 2)
    val fresh = Pipeline.enrichMetadata(batch, configuredRetryCount = 5)
      .select("metadata.*").collect()(0)
    assert(fresh.getAs[Int]("rabbitmq_retry_count") == 0)
  }

  test("forRoute applies R1 BEFORE the too-old filter: a null/negative " +
      "timestamp processes at ingestion wall-clock instead of silently " +
      "failing the R2 predicate") {
    val route = StreamRouteConfig("app", "app_origin")
    val batch = envelopes("app", Seq(
      ("nullts", "v1", ts("2024-01-31 00:00:00")),
      ("negts", "v2", ts("2024-01-31 00:00:00")),
      ("stale", "v3", ts("2024-01-01 00:00:00"))))
      .withColumn("timestamp",
        when(col("key").cast("string") === "nullts",
          lit(null).cast("timestamp"))
          .when(col("key").cast("string") === "negts",
            lit("1901-01-01 00:00:00").cast("timestamp"))
          .otherwise(col("timestamp")))
    val now = lit("2024-01-31 00:00:00").cast("timestamp")
    val out = Pipeline.forRoute(route, identity, now = now)(batch).collect()
    val keys = out.map(r => new String(r.getAs[Array[Byte]]("key"))).toSet
    assert(keys == Set("nullts", "negts"),
      s"got $keys — R1 must rescue null/negative ts; stale still drops")
  }

  test("user payload contract: message/key/metadata only, retry hops counted " +
      "(create-user-payload, streams_test.clj:62-68 twin)") {
    val batch = envelopes("app", Seq(("k", """{"a":1}""", ts("2024-01-01 00:00:00"))))
      .withColumn("message", col("value").cast("string"))
      .withColumn("retryCount", lit(3))          // 2 hops taken of 5
    val out = Pipeline.userPayload(configuredRetryCount = 5)(batch)
    assert(out.columns.toSet == Set("message", "key", "metadata"),
      s"transport fields must be stripped; got ${out.columns.toSet}")
    val row = out.select("metadata.*").collect()(0)
    assert(row.getAs[Int]("rabbitmq_retry_count") == 2)
    // first delivery (retryCount null) → zero hops
    val fresh = Pipeline.userPayload(5)(
      batch.withColumn("retryCount", lit(null).cast("int")))
      .select("metadata.*").collect()(0)
    assert(fresh.getAs[Int]("rabbitmq_retry_count") == 0)
  }

  test("ingestion-time fallback replaces negative/missing timestamps (R1)") {
    val sess = spark
    import sess.implicits._
    val batch = envelopes("app", Seq(("k", "v", ts("2024-01-01 00:00:00"))))
      .withColumn("timestamp", lit(null).cast("timestamp"))
    val out = Pipeline.ingestionTime(batch).collect()(0)
    assert(out.getAs[java.sql.Timestamp]("timestamp") != null)
  }

  test("R1's epoch boundary is the INSTANT epoch, not session-local " +
      "midnight: in a UTC+9 session a corrupt timestamp in (-9h, 0) " +
      "escaped the string-literal boundary, then the too-old filter " +
      "silently dropped the record — the exact loss R1 exists to prevent") {
    // per-session conf: an isolated child session keeps the TZ change
    // away from concurrently-running suites
    val sess = spark.newSession()
    sess.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    import sess.implicits._
    val batch = Seq(("k", "v")).toDF("k", "v").select(
      col("k").cast("binary").as("key"),
      col("v").cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
      // one hour BEFORE the epoch instant: negative, must be rescued
      org.apache.spark.sql.functions.timestamp_millis(lit(-3600000L))
        .as("timestamp"),
      lit("e").as("topicEntity"))
    val now = new java.sql.Timestamp(System.currentTimeMillis)
    val out = Pipeline.ingestionTime(batch, lit(now)).collect()(0)
    assert(out.getAs[java.sql.Timestamp]("timestamp") == now,
      s"negative timestamp must be rewritten to now, got $out")
    // and a small POSITIVE 1970 timestamp is legitimate — never rewritten
    val pos = batch.withColumn("timestamp",
      org.apache.spark.sql.functions.timestamp_millis(lit(3600000L)))
    val kept = Pipeline.ingestionTime(pos, lit(now)).collect()(0)
    assert(kept.getAs[java.sql.Timestamp]("timestamp").getTime == 3600000L,
      s"a positive epoch timestamp must be kept, got $kept")
  }

  test("json middleware parses value and corrupt rows split to DLQ path (M3/E9)") {
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    val batch = envelopes("app", Seq(
      ("good", """{"id": 7, "name": "x"}""", ts("2024-01-01 00:00:00")),
      ("bad", "not json at all {", ts("2024-01-01 00:00:01"))))
    val parsed = Middleware.json(schema)(batch)
    val (ok, corrupt) = Middleware.splitCorrupt(parsed)
    assert(ok.count() == 1)
    assert(ok.select("message.id").collect()(0).getInt(0) == 7)
    val corruptRows = corrupt.collect()
    assert(corruptRows.length == 1)
    // E9: raw bytes preserved for the DLQ
    assert(new String(corruptRows(0).getAs[Array[Byte]]("value"))
      .startsWith("not json"))
  }

  test("kafka headers survive the retry hop and are stripped from the user " +
      "payload (K2 header propagation + create-user-payload dissoc)") {
    val dir = tmpDir("headers")
    val topics = new FileTopicIO(s"$dir/topics")
    val route = StreamRouteConfig(topicEntity = "h", originTopic = "h_origin",
      retry = RetryConfig(enabled = true, count = 2,
        backoffType = BackoffType.Linear, queueTimeoutMs = 0L))
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map("h" -> route)), topics, s"$dir/ckpt")
    val sess = spark
    import sess.implicits._
    val env = Seq(Envelope("k".getBytes, "v".getBytes, "h_origin", 0, 0L,
      new java.sql.Timestamp(System.currentTimeMillis), "h",
      headers = Some(Seq(Header("trace-id", "t-123".getBytes),
        Header("origin", "svc-a".getBytes))))).toDF()
    topics.append(env, "h_origin")

    engine.startStreamRoute(route, identity,
      Dispatch.ExprHandler(lit("retry")),
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).awaitTermination()
    engine.stopAll()

    val retry = topics.read(spark, "h_retry").collect()
    assert(retry.length == 1)
    val hs = retry(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
    assert(hs.map(h => (h.getString(0),
      new String(h.getAs[Array[Byte]](1)))).toSeq ==
      Seq(("trace-id", "t-123"), ("origin", "svc-a")),
      "headers must ride the envelope through the retry hop unchanged")

    val payload = Pipeline.userPayload(2)(
      Pipeline.enrichMetadata(topics.read(spark, "h_retry"))
        .withColumn("message", col("value")))
    assert(!payload.columns.contains("headers"),
      "user payload must not expose transport headers (mapper.clj:18-26)")
  }

  test("protoNative probes for spark-protobuf and fails with guidance when " +
      "the optional module is absent (this container has no such jar)") {
    assert(!Middleware.hasSparkProtobuf)
    val e = intercept[IllegalStateException](
      Middleware.protoNative("Photo", "/tmp/desc.bin")(
        envelopes("app", Seq(("k", "v", ts("2024-01-01 00:00:00"))))))
    assert(e.getMessage.contains("Middleware.proto"))
  }

  test("proto middleware decodes real wire bytes per the descriptor and " +
      "nulls corrupt to the DLQ path (M1/E9)") {
    import graft.functions.ProtoWire.{ProtoField, ProtoMessage, PType}
    val msg = ProtoMessage("photo", Seq(
      ProtoField(1, "id", PType.PInt32),
      ProtoField(2, "path", PType.PString)))
    // hand-encoded wire bytes (08 07 = id:7; 12 len path), independent of
    // the codec's own encoder
    val path = "/photos/h2k3j4h9h23".getBytes("UTF-8")
    val good = Array[Byte](0x08, 0x07, 0x12, path.length.toByte) ++ path
    val sess = spark
    import sess.implicits._
    val rows = Seq(
      Envelope("k1".getBytes, good, "t", 0, 0L, ts("2024-01-01 00:00:00"), "t"),
      Envelope("k2".getBytes, Array[Byte](0x0f), "t", 0, 1L,
        ts("2024-01-01 00:00:00"), "t")).toDF()
    val parsed = Middleware.proto(msg)(rows)
    val (ok, corrupt) = Middleware.splitCorrupt(parsed)
    val m = ok.select("message.id", "message.path").collect()
    assert(m.length == 1 && m(0).getInt(0) == 7
      && m(0).getString(1) == "/photos/h2k3j4h9h23")
    // E9: the corrupt row keeps its raw wire bytes for the DLQ
    val c = corrupt.collect()
    assert(c.length == 1
      && c(0).getAs[Array[Byte]]("value").sameElements(Array[Byte](0x0f)))
  }

  test("M2 corrupt routing: splitCorrupt over protoStruct's message_json " +
      "column — the hard-coded 'message' made the documented " +
      "splitCorrupt(protoStruct(df)) composition fail with an " +
      "unresolved-column error, leaving M2 corrupt rows no DLQ route") {
    val sess = spark
    import sess.implicits._
    // Struct{"b":"x"} hand-encoded per struct.proto: entry key 0a 01 62,
    // value 12 03 (string_value 1a 01 78)
    val entryB = Array[Byte](0x0a, 0x01, 0x62, 0x12, 0x03, 0x1a, 0x01, 0x78)
    val wire = Array[Byte](0x0a, entryB.length.toByte) ++ entryB
    val rows = Seq(
      Envelope("k1".getBytes, wire, "t", 0, 0L,
        ts("2024-01-01 00:00:00"), "t"),
      Envelope("k2".getBytes, Array[Byte](0x0f), "t", 0, 1L,
        ts("2024-01-01 00:00:00"), "t")).toDF()
    val (ok, corrupt) =
      Middleware.splitCorrupt(Middleware.protoStruct(rows), "message_json")
    val m = ok.select("message_json").collect()
    assert(m.length == 1 && m(0).getString(0) == """{"b":"x"}""", m.toSeq)
    val c = corrupt.collect()
    assert(c.length == 1
      && c(0).getAs[Array[Byte]]("value").sameElements(Array[Byte](0x0f)))
  }
}
