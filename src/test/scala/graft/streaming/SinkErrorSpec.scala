package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** A5/E4 — sink error classification and retry (reference: typed HTTP
  * status errors inventory.go:34-43 + stream retry loop main.go:71-91).
  */
class SinkErrorSpec extends AnyFunSuite with Matchers {

  test("transient failures retry and succeed") {
    var calls = 0
    val out = StreamIngest.retrying(attempts = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky fs")
      "ok"
    }
    out shouldBe "ok"
    calls shouldBe 3
  }

  test("retries are bounded: the final failure propagates") {
    var calls = 0
    an[java.io.IOException] should be thrownBy
      StreamIngest.retrying(attempts = 3, backoffMs = 1) {
        calls += 1; throw new java.io.IOException("always down")
      }
    calls shouldBe 3
  }

  test("semantic violations never retry (duplicate-key strict mode)") {
    var calls = 0
    an[IllegalArgumentException] should be thrownBy
      StreamIngest.retrying(attempts = 5, backoffMs = 1) {
        calls += 1; require(false, "duplicate asset key")
      }
    calls shouldBe 1 // IllegalArgumentException is not retryable
    StreamIngest.isRetryable(new StreamIngest.InvalidStateException("x")) shouldBe false
    StreamIngest.isRetryable(new java.io.IOException("x")) shouldBe true
  }

  test("kafka source config wires auth + backpressure options") {
    val cfg = StreamIngest.KafkaSourceConfig(
      servers = "broker:9093", topic = "assets-v0",
      securityProtocol = Some("SASL_SSL"),
      saslMechanism = Some("SCRAM-SHA-256"),
      saslJaasConfig = Some("org.apache.kafka.common.security.scram.ScramLoginModule required username='u' password='p';"),
      maxOffsetsPerTrigger = Some(10000L))
    val o = cfg.options
    o("kafka.security.protocol") shouldBe "SASL_SSL"
    o("kafka.sasl.mechanism") shouldBe "SCRAM-SHA-256"
    o("maxOffsetsPerTrigger") shouldBe "10000"
    o("subscribe") shouldBe "assets-v0"
    // no auth configured => no auth keys leak into options
    StreamIngest.KafkaSourceConfig("b", "t").options.keySet should not contain "kafka.sasl.mechanism"
  }
}
