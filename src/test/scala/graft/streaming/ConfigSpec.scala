package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private def route(entity: String = "default") = StreamRouteConfig(
    topicEntity = entity, originTopic = s"$entity-topic")

  test("valid config passes validation") {
    val cfg = EngineConfig(streamRoutes = Map("default" -> route()))
    assert(EngineConfig.validate(cfg).isEmpty)
  }

  test("entity in both stream and batch routes is rejected (init.clj:202-224)") {
    val cfg = EngineConfig(
      streamRoutes = Map("e" -> route("e")),
      batchRoutes = Map("e" -> BatchRouteConfig("e", "t")))
    assert(EngineConfig.validate(cfg).exists(_.contains("both stream and batch")))
  }

  test("key/entity mismatch, empty origin-topic, bad retry are all reported") {
    val cfg = EngineConfig(streamRoutes = Map(
      "a" -> route("b").copy(originTopic = ""),
      "c" -> route("c").copy(retry = RetryConfig(enabled = true, count = 30,
        backoffType = BackoffType.Exponential))))
    val errs = EngineConfig.validate(cfg)
    assert(errs.exists(_.contains("key 'a' != entity 'b'")))
    assert(errs.exists(_.contains("empty origin-topic")))
    assert(errs.exists(_.contains("> 25")))
  }

  test("channel validation: name mismatch and non-positive worker count") {
    val cfg = EngineConfig(streamRoutes = Map("e" -> route("e").copy(
      channels = Map("c1" -> ChannelConfig("other", workerCount = 0)))))
    val errs = EngineConfig.validate(cfg)
    assert(errs.exists(_.contains("channel key 'c1' != name 'other'")))
    assert(errs.exists(_.contains("worker-count must be > 0")))
  }

  test("topic naming mirrors the reference queue topology") {
    assert(EngineConfig.retryTopic("app") == "app_retry")
    assert(EngineConfig.deadLetterTopic("app") == "app_dead_letter")
    assert(EngineConfig.instantTopic("app") == "app_instant")
    assert(EngineConfig.channelTopic("app", "c1") == "app_channel_c1")
  }

  test("security config translates to kafka.* source/sink options (config.clj:233-298 twin)") {
    val sec = SecurityConfig(
      protocol = Some("SASL_SSL"),
      sslTruststoreLocation = Some("/etc/tls/trust.jks"),
      sslTruststorePassword = Some("ts-secret"),
      saslMechanism = Some("PLAIN"),
      saslJaasConfig = Some(SecurityConfig.plainJaas("svc", "pw")))
    val o = sec.kafkaOptions
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(o("kafka.ssl.truststore.location") == "/etc/tls/trust.jks")
    assert(o("kafka.sasl.mechanism") == "PLAIN")
    assert(o("kafka.sasl.jaas.config").contains("username=\"svc\""))
    assert(!o.contains("kafka.ssl.keystore.location"),
      "unset fields must not emit options")
    assert(SecurityConfig().kafkaOptions.isEmpty)
  }
}
