package graft.decode

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.schema.Schemas.{Envelope, MetadataEntry}

/** Table-driven decode tests (analog of reference vulcan/vulcan_test.go:
  * 141-267): header projection, version gate, JSON decode, key parse,
  * tombstone synthesis, validity routing.
  */
class DecodeSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val meta = Seq(
    MetadataEntry("version", "0.1.2"),
    MetadataEntry("type", "Hostname"),
    MetadataEntry("identifier", "web0.example.org"))

  private val goodPayload =
    """{"Id":"x1","Team":{"Id":"alpha","Name":"alpha name","Description":"d","Tag":"t"},
      |"Alias":"al","Rolfp":"R:0/O:1/L:0/F:1/P:0+S:1","Scannable":true,
      |"AssetType":"Hostname","Identifier":"web0.example.org",
      |"Annotations":[{"Key":"discovery/aws/account","Value":"000000000000"}]}"""
      .stripMargin.replace("\n", "")

  private def decode(envs: Envelope*): DataFrame =
    Decode.decode(envs.toSeq.toDF())

  test("valid refresh message decodes fully") {
    val out = decode(Envelope("alpha/x1", goodPayload, meta)).collect()(0)
    out.getAs[Boolean]("valid") shouldBe true
    out.getAs[Boolean]("is_nil") shouldBe false
    out.getAs[String]("version") shouldBe "0.1.2"
    out.getAs[String]("asset_type") shouldBe "Hostname"
    out.getAs[String]("team_id") shouldBe "alpha"
    out.getAs[String]("asset_id") shouldBe "x1"
    val payload = out.getAs[org.apache.spark.sql.Row]("payload")
    payload.getAs[String]("Identifier") shouldBe "web0.example.org"
    payload.getAs[org.apache.spark.sql.Row]("Team").getAs[String]("Name") shouldBe "alpha name"
  }

  test("missing required header invalidates the row") {
    val incomplete = meta.filterNot(_.key == "identifier")
    val out = decode(Envelope("alpha/x1", goodPayload, incomplete)).collect()(0)
    out.getAs[Boolean]("valid") shouldBe false
  }

  test("version gate: major must be 0 and >= 3 dot parts, optional v prefix") {
    // reference vulcan/vulcan.go:160-180
    val cases = Seq(
      "0.1.2" -> true, "v0.1.2" -> true, "0.1.2.9" -> true,
      "1.0.0" -> false, "v1.2.3" -> false, "0.1" -> false,
      "garbage" -> false, "" -> false)
    cases.foreach { case (v, want) =>
      val m = Seq(MetadataEntry("version", v), MetadataEntry("type", "T"),
        MetadataEntry("identifier", "i"))
      val out = decode(Envelope("a/b", goodPayload, m)).collect()(0)
      withClue(s"version '$v': ") { out.getAs[Boolean]("valid") shouldBe want }
    }
  }

  test("malformed JSON payload invalidates (strict callers halt — SURVEY §7.4)") {
    val out = decode(Envelope("alpha/x1", "{", meta)).collect()(0)
    out.getAs[Boolean]("valid") shouldBe false
  }

  test("tombstone: null value is valid, flagged, and key/headers still project") {
    val out = decode(Envelope("alpha/x1", null, meta)).collect()(0)
    out.getAs[Boolean]("valid") shouldBe true
    out.getAs[Boolean]("is_nil") shouldBe true
    out.getAs[String]("identifier") shouldBe "web0.example.org"
    out.getAs[String]("team_id") shouldBe "alpha"
  }

  test("key must have exactly two /-separated segments") {
    for (badKey <- Seq("noslash", "a/b/c")) {
      val out = decode(Envelope(badKey, goodPayload, meta)).collect()(0)
      withClue(s"key '$badKey': ") { out.getAs[Boolean]("valid") shouldBe false }
    }
  }
}
