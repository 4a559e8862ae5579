package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.Md5PrefixLong

/** A/B the native md5-prefix expression vs the built-in
  * conv(substring(md5)) chain over the documents corpus' char-5-grams
  * (the real hot shape: ~100 hashes/doc). Test/runMain graft.tools.HashBench [sfdir]
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSpec.session
    spark.range(1000).selectExpr("sum(id)").collect()
    val grams = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(graft.ext.TextAnalysis.charNgrams(col("text"), 5)).as("g"))
      .persist()
    println(s"[hb] grams=${grams.count()}")
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        grams.select(max(c)).collect()
        println(f"[hb] $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("builtin", conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
    time("native ", Md5PrefixLong(col("g"), 15))
    spark.stop()
  }
}
