package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Time individual declared queries (Test/runMain graft.tools.QueryTime
  * <sfdir> <runs> <query...>) — the focused counterpart of graft.Bench for
  * iterating on one operator's plan without a full 49-query sweep.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSpec.session
    // ad-hoc conf overrides for A/B timing: GRAFT_CONF="k=v;k=v"
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        (dt, n)
      }
      println(f"[qtime] $name rows=${ts.head._2} runs=${ts.map(t => f"${t._1}%.2f").mkString(",")} min=${ts.map(_._1).min}%.2f")
    }
    spark.stop()
  }
}
