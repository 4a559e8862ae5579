package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.schema.Schemas.MetadataEntry

/** Strict-vs-permissive pipeline semantics beyond decode validity: the
  * reference halts the stream when an AWS-account annotation value cannot
  * be normalized (main.go:254-262); permissive mode skips the annotation
  * and keeps the asset.
  */
class PipelineStrictSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def envelope(awsValue: String) = {
    val meta = Seq(MetadataEntry("version", "0.1.2"),
      MetadataEntry("type", "Hostname"),
      MetadataEntry("identifier", "web1.example.org"))
    val payload =
      s"""{"Id":"a1","Team":{"Id":"alpha","Name":"alpha","Description":"","Tag":""},
         |"Alias":"","Rolfp":"","Scannable":true,"AssetType":"Hostname",
         |"Identifier":"web1.example.org",
         |"Annotations":[{"Key":"discovery/aws/account","Value":"$awsValue"}]}"""
        .stripMargin.replace("\n", "")
    Seq((0L, "alpha/a1", payload, meta))
      .toDF("offset", "key", "value", "metadata")
  }

  test("strict mode halts on an un-normalizable AWS account id") {
    val e = intercept[IllegalArgumentException](
      Pipeline.replay(spark, envelope("not-an-account")))
    e.getMessage should include("invalid AWS account id")
  }

  test("permissive mode skips the bad annotation but keeps the asset") {
    val st = Pipeline.replay(spark, envelope("not-an-account"),
      Pipeline.Config(strict = false))
    st.assets.collect().map(_.getAs[String]("id")).toSet shouldBe
      Set("Hostname/web1.example.org") // no AWSAccount vertex
    st.parentOf.count() shouldBe 0
  }

  test("valid short account id still parents the asset in strict mode") {
    val st = Pipeline.replay(spark, envelope("000000000000"))
    st.assets.collect().map(_.getAs[String]("id")).toSet shouldBe Set(
      "Hostname/web1.example.org", "AWSAccount/arn:aws:iam::000000000000:root")
    st.parentOf.count() shouldBe 1
  }
}
