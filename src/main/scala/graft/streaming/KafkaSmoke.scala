package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** One-command Kafka cluster smoke test — the live-broker twin of
  * EngineDemo (mirror of the reference's cluster test target,
  * Makefile:40-50, which runs its suite against docker-compose brokers).
  *
  * {{{
  *   spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> \
  *     --class graft.streaming.KafkaSmoke <jar> [bootstrap] [nEvents]
  * }}}
  *
  * This container ships no connector jar, so the main COMPILES always (the
  * Kafka path is string-resolved via format("kafka")) and exits 2 with an
  * explanation when the connector is absent; on any real cluster it runs
  * the full gauntlet:
  *
  *  1. provision: create the origin/retry/DLQ topics via the broker's
  *     AdminClient when kafka-clients is on the classpath (reflective — no
  *     compile-time dependency), else rely on broker auto-create.
  *  2. produce `nEvents` envelopes through the Kafka SINK — JSON bodies
  *     with deterministic ~0.5% business failures and ~0.5% corrupt
  *     records, plus a protobuf tranche encoded with the repo's own wire
  *     codec (ProtoWire.encode) and decoded back by the proto middleware.
  *  3. run the real stream route (source → too-old filter → middleware →
  *     handler dispatch) with retry enabled, then one retry-reader hop to
  *     drain the retry topic into success/DLQ.
  *  4. assert counts: the success tally must equal the clean-message
  *     count, the DLQ (read back THROUGH the Kafka batch source) must
  *     hold exactly the corrupt + retry-exhausted messages, and the proto
  *     tranche must decode in full.
  *
  * Prints `SMOKE_OK` and exits 0 on success; prints the first mismatch and
  * exits 1 on failure.
  */
object KafkaSmoke {

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  /** Topic creation via the SHARED provisioner
    * ([[KafkaTopicIO.createTopics]] — also what the production
    * transport's provision() runs): per-topic futures are checked, so
    * an ACL/policy rejection prints the real error instead of a false
    * "provisioned" success followed by an opaque producer timeout. */
  private def provision(bootstrap: String, topics: Seq[String]): Unit =
    try {
      KafkaTopicIO.createTopics(bootstrap, SecurityConfig(), topics)
      println(s"[smoke] provisioned ${topics.mkString(", ")}")
    } catch {
      case e: Throwable =>
        println(s"[smoke] provision FAILED (${e.getMessage}); " +
          "continuing — topics may already exist or auto-create may apply")
    }

  def main(args: Array[String]): Unit = {
    val bootstrap = args.headOption.getOrElse("localhost:9092")
    val n = args.lift(1).map(_.toLong).getOrElse(10000L)
    if (!connectorPresent) {
      System.err.println(
        "[smoke] spark-sql-kafka connector not on the classpath — run with\n" +
          "  --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>\n" +
          "against a live broker. Exiting 2 (not a failure of the engine).")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .appName("graft-kafka-smoke")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val entity = s"smoke${System.currentTimeMillis() / 1000}"
    val origin = s"${entity}_origin"
    val topics = new KafkaTopicIO(bootstrap)
    provision(bootstrap, Seq(origin,
      EngineConfig.retryTopic(entity), EngineConfig.instantTopic(entity),
      EngineConfig.deadLetterTopic(entity), s"${entity}_proto"))

    // ---- JSON tranche: id % 200 == 199 → business failure (the handler
    // keeps returning retry for the unchanged negative amount, so these
    // EXHAUST into the DLQ — the assertions below count them there);
    // % 200 == 198 → corrupt bytes (deser DLQ, E9)
    val env = spark.range(n).select(
      encode(col("id").cast("string"), "UTF-8").as("key"),
      encode(when(col("id") % 200 === 198, lit("corrupt-not-json"))
        .otherwise(concat(lit("{\"amount\": "),
          when(col("id") % 200 === 199, lit(-1)).otherwise(col("id") % 100),
          lit("}"))), "UTF-8").as("value"))
    topics.append(env, origin)
    val nCorrupt = spark.range(n).filter(col("id") % 200 === 198).count()
    val nRetry = spark.range(n).filter(col("id") % 200 === 199).count()

    // ---- proto tranche: our own wire codec encodes, the middleware decodes
    import graft.functions.ProtoWire
    import ProtoWire.{ProtoField, ProtoMessage, PType}
    val msg = ProtoMessage("SmokeEvent", Seq(
      ProtoField(1, "amount", PType.PInt64),
      ProtoField(2, "source", PType.PString)))
    val protoTopic = s"${entity}_proto"
    val nProto = 1000L
    val sess = spark
    import sess.implicits._
    val protoRows = spark.range(nProto).as[Long].map { i =>
      (i.toString.getBytes("UTF-8"),
        ProtoWire.encode(
          org.apache.spark.sql.catalyst.InternalRow(i % 100,
            org.apache.spark.unsafe.types.UTF8String.fromString("smoke")),
          msg))
    }.toDF("key", "value")
    topics.append(protoRows, protoTopic)

    // ---- the real route: stream source → middleware → dispatch, retry on
    val base = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val route = StreamRouteConfig(
      topicEntity = entity, originTopic = origin,
      retry = RetryConfig(enabled = true, count = 1,
        backoffType = BackoffType.Linear, queueTimeoutMs = 0L))
    val engine = new GraftEngine(spark,
      EngineConfig(streamRoutes = Map(entity -> route)), topics, s"$base/ckpt")
    val schema = StructType(Seq(StructField("amount", IntegerType)))
    val handler = Dispatch.ExprHandler(
      when(col("message").isNull, "dead_letter")
        .when(col("message.amount") < 0, "retry")
        .otherwise("success"))
    engine.startStreamRoute(route, Middleware.json(schema), handler,
      Trigger.AvailableNow()).awaitTermination()
    // two retry hops: count 1 → 0 (republish), then exhaustion → DLQ —
    // the handler keeps seeing the same negative amount (same discipline
    // as EngineDemo's drain)
    engine.startRetryReader(route, Middleware.json(schema), handler,
      Trigger.AvailableNow()).awaitTermination()
    engine.stopRoute(s"retry-$entity")
    engine.startRetryReader(route, Middleware.json(schema), handler,
      Trigger.AvailableNow()).awaitTermination()
    engine.stopAll()

    // ---- proto route: batch-read through the Kafka source, decode
    val protoDecoded = Middleware.proto(msg)(topics.read(spark, protoTopic))
    val protoOk = protoDecoded.filter(col("message.source") === "smoke").count()

    // ---- assertions, read back through the Kafka batch source
    val dlq = topics.readExact(spark, EngineConfig.deadLetterTopic(entity)).count()
    var failed = false
    def check(label: String, got: Long, want: Long): Unit =
      if (got != want) { failed = true
        System.err.println(s"[smoke] FAIL $label: got $got want $want")
      } else println(s"[smoke] ok $label = $got")
    // corrupt rows DLQ at the first hop; retry rows exhaust (count 1) on
    // the retry hop and land in the DLQ too; everything else succeeds
    check("success", engine.metrics.count(s"$entity.message.success"),
      n - nCorrupt - nRetry)
    check("dlq", dlq, nCorrupt + nRetry)
    check("proto_decoded", protoOk, nProto)
    println(s"METRICS=${engine.metrics.snapshot().toSeq.sortBy(_._1)}")
    if (failed) { println("SMOKE_FAIL"); spark.stop(); sys.exit(1) }
    println("SMOKE_OK"); spark.stop()
  }
}
