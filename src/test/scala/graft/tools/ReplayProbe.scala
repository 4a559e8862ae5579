package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.Pipeline
import graft.schema.Schemas.{Envelope, MetadataEntry}

/** Scale probe (Test/runMain graft.tools.ReplayProbe [nEvents]): replay a
  * hot SINGLE-KEY log — the worst case for per-key-sequenced replay. With
  * tombstone-segment epochs the epoch count stays O(#tombstones) (here 3),
  * not O(#events); the round-1 design ran one Spark job chain per event.
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSpec.session
    import spark.implicits._
    val meta = Seq(MetadataEntry("version", "0.1.2"),
      MetadataEntry("type", "Hostname"),
      MetadataEntry("identifier", "hot.example.org"))
    val payload =
      """{"Id":"hot","Team":{"Id":"alpha","Name":"alpha name","Description":"d","Tag":"t"},
        |"Alias":"a","Rolfp":"","Scannable":true,"AssetType":"Hostname",
        |"Identifier":"hot.example.org","Annotations":[]}""".stripMargin.replace("\n", "")
    val envs = (0 until n).map { i =>
      (i.toLong, if (i == n / 2) Envelope("alpha/hot", null, meta)
                 else Envelope("alpha/hot", payload, meta))
    }.toDF("offset", "env")
      .select(col("offset"), col("env.key").as("key"),
        col("env.value").as("value"), col("env.metadata").as("metadata"))
    val t0 = System.nanoTime()
    val st = Pipeline.replay(spark, envs)
    val asset = st.assets.collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"PROBE: replay($n-event hot key) took $secs%.1f s; " +
      s"expiration=${asset.getAs[java.sql.Timestamp]("expiration")} " +
      s"first_seen=${asset.getAs[java.sql.Timestamp]("first_seen")} " +
      s"last_seen=${asset.getAs[java.sql.Timestamp]("last_seen")} " +
      s"owns_end=${st.owns.collect().head.getAs[java.sql.Timestamp]("end_time")}")
    spark.stop()
  }
}
