package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** IntDot must equal the integer HOF fold, with its null-poisoning and
  * length-mismatch semantics, on both execution paths.
  */
class IntDotSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("equals the HOF fold; null and mismatch poison") {
    val df = Seq(
      (Some(Seq(1L, -2L, 3L)), Some(Seq(4L, 5L, -6L))), // 4 - 10 - 18 = -24
      (None, Some(Seq(1L))),
      (Some(Seq(1L, 2L)), Some(Seq(1L)))
    ).toDF("a", "b")
    val rows = df.select(IntDot(col("a"), col("b")).as("n"), hof(col("a"), col("b")).as("h"))
      .collect()
    rows(0).getLong(0) shouldBe -24L
    rows(0).getLong(1) shouldBe -24L
    rows(1).isNullAt(0) shouldBe true
    rows(2).isNullAt(0) shouldBe true
    rows(2).isNullAt(1) shouldBe true
  }

  test("interpreted path agrees with codegen") {
    val df = Seq((Seq(7L, -9L, 127L), Seq(3L, 11L, -127L))).toDF("a", "b")
    val expect = df.select(IntDot(col("a"), col("b"))).collect()(0).getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      df.select(IntDot(col("a"), col("b"))).collect()(0).getLong(0) shouldBe expect
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
