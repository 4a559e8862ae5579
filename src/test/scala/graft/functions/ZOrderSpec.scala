package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ZOrderSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  test("interleave is a bijection on the 2^10 x 2^10 grid (spot grid) and matches a bit model") {
    def model(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", expr(ZOrder.interleaveSql("x", "y", bits = 10)))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => z shouldBe model(x, y, 10) }
    got.map(_._3).distinct.length shouldBe pts.length // injective on the grid
  }

  test("z-range blocks are rectangles: every 4096-cell block spans <= 64 in each dim") {
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val spans = pts.toDF("x", "y")
      .withColumn("z", expr(ZOrder.interleaveSql("x", "y", bits = 10)))
      .groupBy(expr("z div 4096").as("blk"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(max("xs"), max("ys")).head()
    spans.getLong(0) should be <= 63L
    spans.getLong(1) should be <= 63L
  }

  test("bits bounds are enforced") {
    intercept[IllegalArgumentException](ZOrder.interleaveSql("x", "y", 0))
    intercept[IllegalArgumentException](ZOrder.interleaveSql("x", "y", 32))
  }
}
