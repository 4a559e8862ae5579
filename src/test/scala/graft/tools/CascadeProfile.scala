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

    // attribute the cascade itself (VERDICT r6 next #6): cost of
    // materializing the four persisted intermediates vs the downstream
    // merge joins once they are warm
    import org.apache.spark.sql.functions.{col, lit}
    val st = graft.graph.GraphOps.State(Synth.assets(spark, dir),
      Synth.teams(spark, dir), Synth.owns(spark, dir), Synth.parentOf(spark, dir))
    val now = lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    val cascade = graft.graph.GraphOps.expireCascadeTracked(
      st, Synth.tombstones(spark, dir).withColumn("ts", now))
    cascade.cached.zipWithIndex.foreach { case (df, i) =>
      t(s"persist_$i")(df.count())
    }
    t("assets_merge_warm")(cascade.state.assets.count())
    t("parentof_merge_warm")(cascade.state.parentOf.count())
    t("owns_warm")(cascade.state.owns.count())
    spark.stop()
  }
}
