package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The native md5-prefix expression must be bit-identical to the built-in
  * chain it replaced (`conv(substring(md5(x), 1, n), 16, 10)`) — that
  * chain IS the oracle contract — on both the codegen and interpreted
  * paths, including unicode, empty strings, and nulls.
  */
class Md5PrefixLongSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "abc", "0|the quick brown fox", "7|abc",
    "über-ünïcödé é中文", "x" * 1000,
    "with spaces and  doubles", "\t\n special")

  test("matches the built-in conv(substring(md5)) chain for every nibble width") {
    val df = samples.toDF("s")
    for (n <- Seq(1, 4, 8, 15)) {
      val rows = df.select(
        Md5PrefixLong(col("s"), n).as("native"),
        conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("builtin"))
        .collect()
      rows.foreach(r => withClue(s"nibbles=$n: ") {
        r.getLong(0) shouldBe r.getLong(1)
      })
    }
  }

  test("interpreted path (no codegen) agrees with codegen") {
    val df = samples.toDF("s")
    val expect = df.select(Md5PrefixLong(col("s"), 15)).collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(Md5PrefixLong(col("s"), 15)).collect().map(_.getLong(0)) shouldBe expect
    }
  }

  test("null input yields null, and the JVM twin agrees") {
    val r = Seq[Option[String]](None, Some("abc")).toDF("s")
      .select(Md5PrefixLong(col("s"), 15)).collect()
    r(0).isNullAt(0) shouldBe true
    r(1).getLong(0) shouldBe
      java.lang.Long.parseLong(graft.ext.TextAnalysis.md5hexJvm("abc").take(15), 16)
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
