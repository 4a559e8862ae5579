package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The ship-it step: execute the capstone curation pipeline and WRITE the
  * release artifact — the piece the query catalog (read-side) doesn't
  * exercise. Layout:
  *
  * {{{
  * <outDir>/corpus/split=train|valid|test/lang=<l>/part-....parquet
  * <outDir>/card/part-....parquet        (per-source dataset card, H51)
  * <outDir>/manifest/part-....parquet    (split x source counts + chars)
  * }}}
  *
  * The corpus write is `partitionBy(split, lang)` — the layout that makes
  * split- and language-scoped training reads PARTITION-PRUNED scans at
  * any scale (a train-split English epoch touches only
  * `split=train/lang=en` files, no row filter involved). File count per
  * partition key follows the upstream task layout; `q_compaction_plan`
  * is the sizing report a production run feeds into a
  * `repartitionByRange` ahead of this write to stay off the small-files
  * cliff — at test SF the default layout already lands one file per key.
  *
  * Membership = `q_corpus_filter` exactly (near-dup drop set +
  * decontamination + quality gates); split = the md5 assignment of
  * `q_train_test_split`; both re-expressed here as the SAME plans the
  * declared queries run, so ReleaseWriteSpec can hold the written
  * artifact to the catalog's row-for-row truth.
  */
object Release {

  final case class Summary(nDocs: Long, bySplit: Map[String, Long])

  def run(spark: SparkSession, sfDir: String, outDir: String): Summary = {
    val kept = ExtQueries.q_corpus_filter.fn(spark, sfDir).select("doc_id")
    val docs = Tables.documents(spark, sfDir)
      .join(kept, "doc_id") // doc_id-keyed equi-join, corpus never collected
      .withColumn("sk",
        graft.functions.Md5PrefixLong(
          concat(lit("split|"), col("doc_id").cast("string")), 15) % 1000)
      .withColumn("split",
        when(col("sk") < 900, "train").when(col("sk") < 950, "valid")
          .otherwise("test"))
      .drop("sk")

    docs.write.mode(SaveMode.Overwrite)
      .partitionBy("split", "lang")
      .parquet(s"$outDir/corpus")

    ReleaseQueries.q_dataset_card.fn(spark, sfDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/card")

    val manifest = docs.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    manifest.write.mode(SaveMode.Overwrite).parquet(s"$outDir/manifest")

    val by = manifest.groupBy(col("split")).agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Summary(by.values.sum, by)
  }

  /** Read a released corpus back; `split`/`lang` predicates prune at the
    * directory level (no file of another split is ever opened).
    */
  def readCorpus(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/corpus")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_release")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    val s = run(spark, sfDir, outDir)
    println(s"""{"released":${s.nDocs},"by_split":${s.bySplit.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
