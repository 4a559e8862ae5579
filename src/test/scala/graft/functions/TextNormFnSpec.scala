package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The canonicalization expressions (UrlNormalize.scala,
  * UnicodeNorm.scala): pure-compute contracts, the SQL registrations,
  * and the codegen path (exercised through a DataFrame projection —
  * SparkSpec sessions run with codegen on).
  */
class TextNormFnSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def norm(s: String): String = {
    val r = UrlNormalize.compute(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  // ---- UrlNormalize: the RFC 3986 §6 table ------------------------------------

  test("case: scheme and host fold, path and query do not") {
    norm("HTTP://ExAmple.COM/Path/File?Q=Val") shouldBe
      "http://example.com/Path/File?Q=Val"
  }

  test("default ports strip; explicit non-default ports survive") {
    norm("http://a.com:80/x") shouldBe "http://a.com/x"
    norm("https://a.com:443/x") shouldBe "https://a.com/x"
    norm("http://a.com:8080/x") shouldBe "http://a.com:8080/x"
    norm("https://a.com:80/x") shouldBe "https://a.com:80/x" // not its default
    norm("http://a.com:/x") shouldBe "http://a.com/x" // empty port drops
  }

  test("percent-encoding: unreserved decode, reserved survive uppercased") {
    norm("http://a.com/%7Euser/%41%2f%3F") shouldBe "http://a.com/~user/A%2F%3F"
    norm("http://a.com/p?x=%2f&y=%61") shouldBe "http://a.com/p?x=%2F&y=a"
  }

  test("dot segments: the RFC §5.2.4 cases") {
    norm("http://a.com/a/b/../c/./d") shouldBe "http://a.com/a/c/d"
    norm("http://a.com/a/..") shouldBe "http://a.com/"
    norm("http://a.com/..") shouldBe "http://a.com/"
    norm("http://a.com/a/.") shouldBe "http://a.com/a/"
    norm("http://a.com/a/b/") shouldBe "http://a.com/a/b/"
    norm("http://a.com") shouldBe "http://a.com/" // empty path -> '/'
    norm("http://a.com?q=1") shouldBe "http://a.com/?q=1"
  }

  test("fragment drops; userinfo survives") {
    norm("http://a.com/x#sec2") shouldBe "http://a.com/x"
    norm("http://u:p@A.com/x") shouldBe "http://u:p@a.com/x"
  }

  test("non-URLs return null, not garbage") {
    norm("not a url") shouldBe null
    norm("://no-scheme.com/") shouldBe null
    norm("http://") shouldBe null
    norm("http://host/%zz") shouldBe null // malformed triplet
    norm("mailto:a@b.com") shouldBe null // not hierarchical
    // RFC 3986 §3.1: scheme must start with ALPHA
    norm("1http://host/") shouldBe null
    norm("+ssh://host/") shouldBe null
    norm("-x://host/") shouldBe null
    norm(".y://host/") shouldBe null
  }

  // ---- Unicode -----------------------------------------------------------------

  test("NFC composes decomposed sequences; ASCII is identity (same object)") {
    val dec = UTF8String.fromString("Nai\u0308ve Cafe\u0301")
    NfcNormalize.compute(dec).toString shouldBe "Na\u00efve Caf\u00e9"
    val ascii = UTF8String.fromString("plain ascii")
    (NfcNormalize.compute(ascii) eq ascii) shouldBe true
  }

  test("StripAccents drops combining marks from either spelling") {
    StripAccents.compute(UTF8String.fromString("Na\u00efve Cafe\u0301 A\u0301"))
      .toString shouldBe "Naive Cafe A"
    val ascii = UTF8String.fromString("plain")
    (StripAccents.compute(ascii) eq ascii) shouldBe true
  }

  // ---- SQL registration + codegen path -------------------------------------------

  test("SQL faces agree with the Column API through a codegen'd projection") {
    val df = Seq(
      "HTTP://WWW.A.COM:80/x/../y/%7Ez?q=%41#f",
      "https://B.org:8443/ok",
      "junk").toDF("u")
    df.createOrReplaceTempView("v_url")
    val viaSql = spark.sql(
      "SELECT graft_url_normalize(u) AS n FROM v_url ORDER BY u")
      .collect().map(r => Option(r.getString(0)))
    val viaApi = df.select(UrlNormalize(col("u")).as("n")).orderBy(col("u"))
      .collect().map(r => Option(r.getString(0)))
    viaSql shouldBe viaApi
    viaSql should contain(Some("http://www.a.com/y/~z?q=A"))
    viaSql should contain(None)

    Seq("Cafe\u0301").toDF("s").createOrReplaceTempView("v_nfc")
    spark.sql("SELECT graft_nfc(s) AS n, graft_strip_accents(s) AS t FROM v_nfc")
      .as[(String, String)].head() shouldBe (("Caf\u00e9", "Cafe"))
  }
}
