package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The written release artifact must equal the catalog's truth: corpus
  * membership == q_corpus_filter, split == q_train_test_split's md5
  * assignment, partition layout prunes, manifest sums match.
  */
class ReleaseWriteSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"
  private lazy val out = {
    val d = java.nio.file.Files.createTempDirectory("graft_release").toString
    Release.run(spark, dir, d)
    d
  }

  test("released corpus membership equals q_corpus_filter row for row") {
    val released = Release.readCorpus(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = ExtQueries.q_corpus_filter.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    released shouldBe kept
  }

  test("split/lang partition directories exist and a split read prunes to them") {
    val corpusDir = new java.io.File(s"$out/corpus")
    val splits = corpusDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
    splits.foreach(s => s should startWith("split="))
    // partition pruning: reading one split scans only its directory
    val train = Release.readCorpus(spark, out).filter("split = 'train'")
    val plan = train.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(split")
    // and the rows carry the md5 assignment q_train_test_split declares
    val expected = graft.Tables.documents(spark, dir)
      .withColumn("sk", graft.functions.Md5PrefixLong(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("split|"),
          org.apache.spark.sql.functions.col("doc_id").cast("string")), 15) % 1000)
      .filter("sk < 900").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = train.select("doc_id").collect().map(_.getLong(0)).toSet
    (got -- expected) shouldBe empty
  }

  test("manifest sums equal the released corpus") {
    val manifest = spark.read.parquet(s"$out/manifest")
    val mTotal = manifest.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0)
    mTotal shouldBe Release.readCorpus(spark, out).count()
  }
}
