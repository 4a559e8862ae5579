package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Dump `.explain("formatted")` for named queries to files
  * (Test/runMain graft.tools.ExplainDump <sfdir> <outdir> <suffix> <query...>)
  * — the plan evidence the optimization rounds commit under plans/rNN/.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSpec.session
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val plan = try fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $out/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
