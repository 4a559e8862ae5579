package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** TopKOrdered must be row-identical to the window form it replaces
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`)
  * — including exact-tie ordering — and independent of partitioning,
  * because partial buffers merge in shuffle order.
  */
class TopKOrderedSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKOrdered(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t").getField("id").as("id"),
        col("t").getField("score").as("s"), (col("pos") + 1).cast("long").as("rnk"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("g"), col("id"), col("s"), col("rnk").cast("long").as("rnk"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4)).toSeq

  test("matches the window form on random data, any partitioning") {
    val rnd = new scala.util.Random(42)
    val data = (1 to 5000).map(i =>
      (rnd.nextInt(7).toLong, i.toLong, math.floor(rnd.nextDouble() * 50) / 10))
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("g", "id", "s").repartition(parts)
      rows(viaAgg(df, 3)) shouldBe rows(viaWindow(df, 3))
    }
  }

  test("exact score ties rank by ascending id") {
    val df = Seq((0L, 30L, 1.5), (0L, 10L, 1.5), (0L, 20L, 1.5), (0L, 40L, 9.9))
      .toDF("g", "id", "s")
    rows(viaAgg(df, 3)) shouldBe Seq(
      (0L, 40L, 9.9, 1L), (0L, 10L, 1.5, 2L), (0L, 20L, 1.5, 3L))
  }

  test("groups smaller than k emit all rows; null scores are skipped") {
    val df = Seq((0L, Some(1L), Some(2.0)), (0L, Some(2L), None), (1L, Some(3L), Some(1.0)))
      .toDF("g", "id", "s")
    rows(viaAgg(df, 5)) shouldBe Seq((0L, 1L, 2.0, 1L), (1L, 3L, 1.0, 1L))
  }

  test("partial buffers cap map-side output: plan aggregates, no Window") {
    val df = spark.range(0, 10000).select(
      (col("id") % 3).as("g"), col("id"), (col("id") % 97).cast("double").as("s"))
    val plan = viaAgg(df, 3).queryExecution.executedPlan.toString
    plan should include("graft_topk_ordered")
    plan should not include "Window"
    // partial (ObjectHashAggregate) below the exchange
    val lines = plan.split("\n")
    val exI = lines.indexWhere(_.contains("Exchange hashpartitioning(g"))
    exI should be >= 0
    lines.drop(exI + 1).exists(l =>
      l.contains("Aggregate") && l.contains("partial_graft_topk_ordered")) shouldBe true
  }
}
