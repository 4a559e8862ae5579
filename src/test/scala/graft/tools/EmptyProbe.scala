package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Robustness probe (Test/runMain graft.tools.EmptyProbe <emptyDir>):
  * run every declared query against ZERO-ROW copies of all tables —
  * empty partitions and empty sources are routine at 100 TB (a new
  * tenant, a filtered branch, day one of a topic) and an operator that
  * throws on them fails whole jobs. Prints each query's outcome.
  */
object EmptyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/tmp/graft_empty")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        println(f"$name%-28s ok rows=$n")
      } catch {
        case e: Throwable =>
          bad += 1
          println(f"$name%-28s FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"[empty] failures: $bad / ${SparkEntry.queries.size}")
    spark.stop()
  }
}
