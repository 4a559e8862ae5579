package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The projection argmax must agree EXACTLY with the window form it
  * replaced — `row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC,
  * cell ASC) = 1` over the corpus×centroids cross — including the
  * low-cell tie-break and the DotProduct fold order, because the DuckDB
  * oracle still computes the window form.
  */
class ArgmaxCellSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").as("v"),
      sqrt(DotProduct(col("embedding"), col("embedding"))).as("nrm"))

  test("matches the row_number-window argmax on real embeddings × 7 centroids") {
    import org.apache.spark.sql.expressions.Window
    val cents = emb.filter(col("vec_id") < 7)
      .select(col("vec_id").as("cell"),
        transform(col("v"), x => x.cast("double")).as("cv"),
        col("nrm").cast("double").as("cn"))
    val cs = cents.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    val native = emb
      .select(col("vec_id"), ArgmaxCell(col("v"), col("nrm"), cs).as("cell"))
    val window = emb.crossJoin(broadcast(cents))
      .withColumn("rk", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy((DotProduct(col("v"), col("cv")) / (col("nrm") * col("cn"))).desc,
          col("cell"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"))
    native.except(window).count() shouldBe 0
    window.except(native).count() shouldBe 0
    native.count() should be > 100L
  }

  test("exact-tie keeps the LOWER cell (strict-greater ascending scan)") {
    // two centroids that are the same direction (one is 2× the other):
    // identical cosine against every vector → cell 10 must win over 20
    val cs = Seq(
      (10L, Seq(2.0, 0.0), math.sqrt(4.0)),
      (20L, Seq(4.0, 0.0), math.sqrt(16.0)))
    val df = Seq((1L, Seq(3.0f, 1.0f)), (2L, Seq(1.0f, -5.0f))).toDF("vec_id", "v")
      .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))
    val rows = df.select(ArgmaxCell(col("v"), col("nrm"), cs)).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(10L, 10L)
  }

  test("null array, null element, and dimension mismatch yield null") {
    val cs = Seq((0L, Seq(1.0, 1.0), math.sqrt(2.0)))
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f)))),
      (2L, None),
      (3L, Some(Seq(Some(1.0f), None))),
      (4L, Some(Seq(Some(1.0f))))
    ).toDF("vec_id", "v")
      .withColumn("nrm", lit(1.0))
    val rows = df.select(ArgmaxCell(col("v"), col("nrm"), cs)).collect()
    rows(0).isNullAt(0) shouldBe false
    rows(1).isNullAt(0) shouldBe true
    rows(2).isNullAt(0) shouldBe true
    rows(3).isNullAt(0) shouldBe true
  }

  test("interpreted path agrees with codegen") {
    val cs = Seq((5L, Seq(1.0, 2.0), math.sqrt(5.0)), (9L, Seq(-1.0, 3.0), math.sqrt(10.0)))
    val df = Seq((Seq(1.5f, -2.5f), 2.915475947422651)).toDF("v", "nrm")
    val expect = df.select(ArgmaxCell(col("v"), col("nrm"), cs)).collect()(0).getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      df.select(ArgmaxCell(col("v"), col("nrm"), cs)).collect()(0).getLong(0) shouldBe expect
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
