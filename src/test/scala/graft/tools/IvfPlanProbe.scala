package graft.tools

import graft.GraftSession

/** One-off diagnostic: print the physical plan of the IVF cell-assignment
  * step (scripts/ style tool, not a test).
  */
object IvfPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val e = graft.ext.Similarity.embFrame(spark, dir)
    val cents = graft.ext.Similarity.ivfCentroidsKmeans(e, nlist = 4, iters = 1)
    println(graft.ext.Similarity.assignCells(e, cents).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
