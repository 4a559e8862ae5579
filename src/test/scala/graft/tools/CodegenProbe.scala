package graft.tools

/** Codegen strictness probe (Test/runMain graft.tools.CodegenProbe
  * [sfDir]): run every declared query with expression codegen FORCED
  * (`spark.sql.codegen.factoryMode=CODEGEN_ONLY`) and whole-stage
  * codegen fallback DISABLED — any custom Expression whose `doGenCode`
  * fails to compile, or any operator silently degrading to interpreted
  * evaluation, fails loudly here instead of shipping as a 10x-slower
  * plan that still returns right answers. This is the enforcement for
  * the "functions, not UDFs / stay inside codegen" performance claim.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(120))
        }
    }
    failures.foreach(f => System.err.println(s"[codegen] FAIL $f"))
    println(s"[codegen] ${graft.SparkEntry.queries.size - failures.size}/" +
      s"${graft.SparkEntry.queries.size} queries green under CODEGEN_ONLY + no fallback")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
