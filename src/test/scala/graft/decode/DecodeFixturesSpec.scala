package graft.decode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.ingest.Pipeline
import graft.sources.Fixtures

/** Fixture-driven decode-layer tests — the analog of the reference's
  * table-driven fixture suites (vulcan_test.go:141-224 over the
  * vulcan/testdata JSON files and streamtest/testdata/valid.json). Fixtures
  * are re-authored to the FIXTURES.md envelope contract, covering the
  * same scenario shapes: a fully-valid stream with a tombstone, a
  * malformed payload mid-stream, an unsupported version mid-stream, and
  * envelope corner cases (no headers, null value, null key, slash-less
  * key).
  */
class DecodeFixturesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def load(name: String) =
    Decode.decode(Fixtures.loadJson(spark,
      getClass.getResource(s"/fixtures/$name").getPath))

  test("valid_assets: all 5 decode, golden fields recovered, tombstone flagged") {
    val rows = load("valid_assets.json").orderBy("offset").collect()
    rows.length shouldBe 5
    rows.foreach(r => r.getAs[Boolean]("valid") shouldBe true)
    // golden struct checks (analog of testdataValidAssets)
    val r0 = rows(0)
    r0.getAs[String]("team_id") shouldBe "team1"
    r0.getAs[String]("asset_id") shouldBe "asset1"
    r0.getAs[String]("asset_type") shouldBe "Hostname"
    r0.getAs[String]("identifier") shouldBe "web1.example.org"
    val p0 = r0.getAs[org.apache.spark.sql.Row]("payload")
    p0.getAs[String]("Identifier") shouldBe "web1.example.org"
    p0.getAs[org.apache.spark.sql.Row]("Team").getAs[String]("Name") shouldBe "Team One"
    p0.getAs[Boolean]("Scannable") shouldBe true
    // v-prefixed version accepted
    rows(1).getAs[String]("version") shouldBe "v0.5.0"
    // tombstone: null value, is_nil set, headers still projected
    val t = rows(3)
    t.getAs[Boolean]("is_nil") shouldBe true
    t.getAs[String]("identifier") shouldBe "web1.example.org"
  }

  test("malformed payload mid-stream: exactly that row invalid; strict replay halts") {
    val rows = load("malformed_mid.json").orderBy("offset").collect()
    rows.map(_.getAs[Boolean]("valid")).toSeq shouldBe Seq(true, true, false, true)
    // strict mode = the batch analog of the reference halting the stream
    val env = Fixtures.loadJson(spark,
      getClass.getResource("/fixtures/malformed_mid.json").getPath)
    val e = intercept[IllegalArgumentException](Pipeline.replay(spark, env))
    e.getMessage should include("strict")
  }

  test("unsupported version mid-stream: version gate rejects exactly that row; strict replay halts") {
    val rows = load("unsupported_version.json").orderBy("offset").collect()
    rows.map(_.getAs[Boolean]("valid")).toSeq shouldBe Seq(true, false, true)
    rows(1).getAs[String]("version") shouldBe "1.2.3"
    val env = Fixtures.loadJson(spark,
      getClass.getResource("/fixtures/unsupported_version.json").getPath)
    an[IllegalArgumentException] should be thrownBy Pipeline.replay(spark, env)
  }

  test("envelope corner cases: missing headers, null key, slash-less key all INVALID (never null)") {
    val rows = load("envelope_corners.json").orderBy("offset").collect()
    // [no headers, tombstone with headers, null key, slash-less key]
    rows.map(_.getAs[Boolean]("valid")).toSeq shouldBe Seq(false, true, false, false)
    // three-valued-logic guard: valid must never be NULL — a null would
    // escape both filter(valid) and the strict quarantine filter(!valid)
    rows.foreach(r => r.isNullAt(r.fieldIndex("valid")) shouldBe false)
  }
}
