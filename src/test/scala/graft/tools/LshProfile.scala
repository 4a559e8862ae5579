package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.{Dedup, TextAnalysis}

/** Stage-level timing of the LSH pair pipeline (Test/runMain
  * graft.tools.LshProfile [sfDir]) to localize run-to-run jitter.
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          array_distinct(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("fs"))
        .select(col("doc_id"),
          transform(col("fs"), x =>
            conv(substring(md5(x), 1, 15), 16, 10).cast("long")).as("hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("materialize shingle+md5")(docs.count())
      timed("full q_minhash_lsh_pairs")(
        Dedup.q_minhash_lsh_pairs.fn(spark, dir).count())
      timed("again (warm)")(
        Dedup.q_minhash_lsh_pairs.fn(spark, dir).count())
      docs.unpersist()
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
