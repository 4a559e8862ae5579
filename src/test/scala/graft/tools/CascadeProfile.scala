package graft.tools

import graft.SparkSpec
import graft.queries.Synth

/** One-off profile of the cascade's input aggregations (Test/runMain
  * graft.tools.CascadeProfile <sfdir>): how much of the cascade queries'
  * wall-clock is just deriving the synthetic snapshot tables from events.
  */
object CascadeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSpec.session
    spark.range(1000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("events_scan")(spark.read.parquet(s"$dir/events.parquet").count())
    t("assets")(Synth.assets(spark, dir).count())
    t("teams")(Synth.teams(spark, dir).count())
    t("owns")(Synth.owns(spark, dir).count())
    t("parentOf")(Synth.parentOf(spark, dir).count())
    t("tombstones")(Synth.tombstones(spark, dir).count())
    spark.stop()
  }
}
