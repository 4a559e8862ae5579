package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.graph.GraphAnalytics

/** k-core probe (Test/runMain graft.tools.KCoreProbe [sfdir]): degree
  * distribution of the co-purchase graph and peel-round counts for a few
  * k values — picks the k for q_kcore (needs a nontrivial peel that
  * converges inside the oracle's unrolled-round budget at sf0.01 AND
  * sf0.1).
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val e = GraphAnalytics.coOccurrenceEdges(
      Tables.lineitem(spark, dir).filter(col("l_partkey") % 10 === 0),
      "l_orderkey", "l_partkey").localCheckpoint(true)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    println(s"=== $dir: edges=${e.count()} vertices=${deg.count()}")
    deg.groupBy("deg").agg(count(lit(1)).as("n")).orderBy("deg")
      .collect().foreach(r => println(s"  deg=${r.get(0)} n=${r.get(1)}"))
    for (k <- Seq(8, 10, 12, 14, 16)) {
      // inline peel with round counting (mirrors GraphAnalytics.kCore)
      var ed = e
      var rounds = 0
      var converged = false
      while (!converged && rounds <= 30) {
        val bad = ed.select(col("a").as("v")).unionAll(ed.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
          .filter(col("d") < k).select("v").localCheckpoint(true)
        if (bad.isEmpty) converged = true
        else {
          ed = ed.join(bad.select(col("v").as("a")), Seq("a"), "left_anti")
            .join(bad.select(col("v").as("b")), Seq("b"), "left_anti")
            .localCheckpoint(true)
          rounds += 1
        }
      }
      val coreV = ed.select(col("a").as("v")).unionAll(ed.select(col("b").as("v")))
        .select("v").distinct().count()
      println(s"  k=$k: rounds=$rounds converged=$converged coreVerts=$coreV coreEdges=${ed.count()}")
    }
    spark.stop()
  }
}
