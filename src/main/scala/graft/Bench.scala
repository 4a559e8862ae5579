package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every declared query at the driver-given SF.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and reports
  * the per-query MEDIAN (plus min) — a single contended scheduling window
  * must not fabricate a 20x outlier into the round total (round-2 driver
  * run: 99 s for a query that cleanly takes 4 s).
  *
  * Failures are REPORTED, never swallowed — a crashed query must not look
  * like a fast success (round-1 bug: 24 dead queries "ran" in 0.05 s each
  * and produced a plausible total).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/Hadoop-FS init otherwise lands entirely
    // on whichever query sorts first and distorts its number
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to runs).flatMap { _ =>
        if (err.isDefined) None // a failed query fails every run; stop early
        else {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            err = Some(e.getClass.getSimpleName)
          }
          val dt = (System.nanoTime() - t0) / 1e9
          // multi-pass queries persist intermediates; drop them so every
          // run (and every later query) starts with clean storage memory
          spark.sqlContext.clearCache()
          if (err.isDefined) None else Some(dt)
        }
      }
      (name, times, err)
    }
    // a query that failed on ANY run is excluded from the totals entirely —
    // a partial success must not inflate the headline number the failure
    // accounting says to discount
    def ok(ts: Seq[Double], err: Option[String]) = err.isEmpty && ts.nonEmpty
    val qs = results.map { case (k, ts, err) =>
      "\"" + k + "\":" + (if (ok(ts, err)) median(ts) else "null")
    }.mkString("{", ",", "}")
    val mins = results.map { case (k, ts, err) =>
      "\"" + k + "\":" + (if (ok(ts, err)) ts.min else "null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, ts, err) if ok(ts, err) => median(ts) }.sum
    val nFailed = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$mins,"failed":$failed,"n_failed":$nFailed,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
