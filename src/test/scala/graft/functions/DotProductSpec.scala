package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The native dot product must be BIT-identical to the HOF fold it
  * replaced — that fold's left-to-right rounding order is the oracle
  * contract — including its null-poisoning and length-mismatch semantics.
  */
class DotProductSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on real embeddings (all pairs vs query 0)") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val rows = e.crossJoin(broadcast(q))
      .select(
        DotProduct(col("embedding"), col("qv")).as("native"),
        hofDot(col("embedding"), col("qv")).as("hof"))
      .collect()
    rows.length should be > 100
    rows.foreach { r =>
      // exact bit equality, not approximate — same fold order
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("null array, null element, and length mismatch all yield null like zip_with") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // 11.0
      (None, Some(Seq(1.0f))), // null input
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))) // length mismatch -> null
    ).toDF("a", "b")
    val rows = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    rows(0).getDouble(0) shouldBe 11.0
    rows(0).getDouble(1) shouldBe 11.0
    rows(1).isNullAt(0) shouldBe true
    rows(1).isNullAt(1) shouldBe true
    rows(2).isNullAt(0) shouldBe true
    rows(2).isNullAt(1) shouldBe true
  }

  test("interpreted path agrees with codegen") {
    val df = Seq((Seq(1.5f, -2.5f, 3.25f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val expect = df.select(DotProduct(col("a"), col("b"))).collect()(0).getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      df.select(DotProduct(col("a"), col("b"))).collect()(0).getDouble(0) shouldBe expect
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
