package graft.tools

import org.apache.spark.sql.functions.col
import graft.{SparkSpec, Tables}
import graft.temporal.Temporal

/** Plan probe (Test/runMain graft.tools.PlanProbe): print the physical
  * plans of scale-sensitive operators so single-partition shuffles /
  * global sorts are visible. Used by the verify flow after plan-shape
  * changes.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val page = Temporal.paginate(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      Seq(col("o_orderkey")), page = 3, size = 100)
    println("=== paginate(page=3, size=100) physical plan ===")
    println(page.queryExecution.executedPlan.toString)
    println(s"rows=${page.count()} first=${page.collect().head}")
    spark.stop()
  }
}
