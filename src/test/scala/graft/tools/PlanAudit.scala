package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Plan audit (Test/runMain graft.tools.PlanAudit [sfDir] [names...]):
  * print red-flag signals per declared query — cartesian products,
  * single-partition exchanges, unpartitioned windows, scans without
  * pushed filters where a filter exists — plus the full plan for any
  * query named on the command line.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val verbose = args.drop(1).toSet

    // audit the SCALE path: pin the size-adaptive graph ops to their
    // dataflow form, as PlanInvariantSpec does — at sf0.001 every graph
    // fits the one-task kernels, whose deliberate repartition(1) would
    // otherwise flag as a SinglePartition in seven queries
    Seq("kcore", "cc", "pagerank", "labelprop", "closure")
      .foreach(op => spark.conf.set(s"spark.graft.$op.localEdgeLimit", "0"))

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val physical = fn(spark, dir).queryExecution.executedPlan
        val plan = physical.toString
        val gw = PlanWalk.unpartitionedWindows(physical)
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // SinglePartition is legitimate directly under a global limit
          // (TakeOrderedAndProject handles those); flag the rest
          "Exchange SinglePartition" -> plan.contains("Exchange SinglePartition"),
          s"unpartitioned WindowExec x$gw" -> (gw > 0),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (f, true) => f }
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
          .map(j => s"$j=${plan.sliding(j.length).count(_ == j)}")
          .filterNot(_.endsWith("=0"))
        println(f"$name%-28s ${if (flags.isEmpty) "ok" else flags.mkString("; ")}  ${joins.mkString(" ")}")
        if (verbose(name)) println(plan)
      } catch {
        case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
