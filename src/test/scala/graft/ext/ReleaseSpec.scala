package graft.ext

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Semantic invariants of the release-preparation operators
  * ([[ReleaseQueries]]) that the DuckDB full-output gate can't express:
  * first-occurrence election, incremental == filtered-full equivalence,
  * pair-count conservation, exclusion rules.
  */
class ReleaseSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("paragraph dedup keeps exactly one copy per distinct segment") {
    val out = ReleaseQueries.q_paragraph_dedup.fn(spark, sf)
    val totals = out.agg(
      sum("n_segs").as("segs"), sum("n_kept").as("kept")).collect()(0)
    // every distinct segment text survives exactly once corpus-wide
    val distinctSegs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(expr(
        "sequence(CAST(0 AS BIGINT), CAST((size(toks)+11) DIV 12 - 1 AS BIGINT))")).as("i"),
        col("toks"))
      .select(concat_ws(" ", slice(col("toks"), (col("i") * 12 + 1).cast("int"), lit(12))).as("t"))
      .distinct().count()
    totals.getLong(1) shouldBe distinctSegs
    totals.getLong(1) should be < totals.getLong(0) // corpus HAS cross-doc dup segments
  }

  test("paragraph dedup: a doc whose segments are all first-occurrences is unchanged") {
    val docs = graft.Tables.documents(spark, sf)
    val out = ReleaseQueries.q_paragraph_dedup.fn(spark, sf)
    val joined = out.join(docs, "doc_id")
      .filter(col("n_kept") === col("n_segs"))
      .select(col("text") === col("new_text")).as[Boolean].collect()
    joined should not be empty
    all(joined) shouldBe true
  }

  test("paragraph dedup survives a mega-duplicated segment (skew case)") {
    // one 12-token segment repeated across 20k docs — the viral-boilerplate
    // shape; the election must keep exactly doc 0's copy and every doc must
    // come back (the join form's map-side combine handles this; a window
    // partitioned by h would hit one 20k-row task here and an unsplittable
    // mega-task at corpus scale)
    import spark.implicits._
    val viral = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 20000L).map(i => (i, viral)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", expr("CAST(length(text) AS BIGINT)"))
    val tmp = java.nio.file.Files.createTempDirectory("skew").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ReleaseQueries.q_paragraph_dedup.fn(spark, tmp)
    out.count() shouldBe 20000L
    out.agg(sum("n_kept")).collect()(0).getLong(0) shouldBe 1L
    out.filter(col("doc_id") === 0).select("new_text")
      .as[String].collect()(0) shouldBe viral
    out.filter(col("doc_id") === 1).select("new_text")
      .as[String].collect()(0) shouldBe ""
  }

  test("incremental dedup pairs == full pairs filtered to new-touching") {
    val full = Dedup.q_minhash_lsh_pairs.fn(spark, sf)
      .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0)
      .select("doc_a", "doc_b", "inter", "uni")
    val inc = ReleaseQueries.q_dedup_incremental.fn(spark, sf)
      .select("doc_a", "doc_b", "inter", "uni")
    inc.exceptAll(full).count() shouldBe 0
    full.exceptAll(inc).count() shouldBe 0
  }

  test("bpe pair counts match a direct bigram recount on a tiny vocab") {
    // "low" x3 + "lower" x1: pair "l o" appears in both words
    val docs = Seq((1L, "low low lower low")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", expr("CAST(length(text) AS BIGINT)"))
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ReleaseQueries.q_bpe_pairs.fn(spark, tmp)
      .as[(String, Long)].collect().toMap
    out("l o") shouldBe 4 // 3x "low" + 1x "lower"
    out("o w") shouldBe 4
    out("w e") shouldBe 1
    out("e r") shouldBe 1
  }

  test("bpe apply: greedy left-to-right merging, no cross-token false matches") {
    import spark.implicits._
    // 'a a' dominates (freq 40); 'e r' and 'l o' tie at 2, rank by pair asc
    val docs = (Seq.fill(10)("aaaaa") ++ Seq("lower", "lower"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", expr("CAST(length(text) AS BIGINT)"))
    val tmp = java.nio.file.Files.createTempDirectory("bpeapply").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ReleaseQueries.q_bpe_apply.fn(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    // greedy non-overlapping: 5 a's -> aa aa a (NOT a aa aa or aaaa a)
    out("aaaaa") shouldBe ("aa aa a", 3L)
    // 'e r' (rank 2) then 'l o' (rank 3); merged 'lo' must NOT chain with
    // 'w' via any cross-token match
    out("lower") shouldBe ("lo w er", 3L)
  }

  test("contamination matrix matches an array-intersect differential (suiteA)") {
    // Different algorithm, same answer: per-doc array_intersect against the
    // driver-collected suiteA shingle set vs the query's explode+equi-join.
    val sh = Dedup.corpusShingles(spark, sf)
    val benchA = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("hs")).as("h")).distinct().as[Long].collect().toSeq
    benchA should not be empty
    val expected = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        functions.size(array_intersect(col("hs"), typedlit(benchA))).as("n"))
      .filter(col("n") > 0)
      .join(graft.Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_hit"), sum("n").as("n_shingle_hits"))
    val got = ReleaseQueries.q_contamination_matrix.fn(spark, sf)
      .filter(col("suite") === "suiteA")
      .select("source", "n_docs_hit", "n_shingle_hits")
    got.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(got).count() shouldBe 0
  }

  test("cluster audit: pair counts bounded by C(n_docs, 2), min<=avg<=max") {
    val rows = ReleaseQueries.q_cluster_audit.fn(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (nDocs, nPairs) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pairs"))
      nDocs should be >= 2L
      nPairs should be >= (nDocs - 1) // spanning connectivity at minimum
      nPairs should be <= nDocs * (nDocs - 1) / 2
      r.getAs[Long]("min_j_ppm") should be <= r.getAs[Long]("avg_j_ppm")
      r.getAs[Long]("avg_j_ppm") should be <= r.getAs[Long]("max_j_ppm")
      r.getAs[Long]("min_j_ppm") should be >= 500000L // the J >= 1/2 gate held
    }
  }

  test("quality mix: tertiles cover all scored docs, head keeps 100%") {
    val mix = ReleaseQueries.q_quality_mix.fn(spark, sf).collect()
    val byBucket = mix.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(rs => (rs.map(_.getAs[Long]("n_docs")).sum,
        rs.map(_.getAs[Long]("n_kept")).sum)).toMap
    byBucket.keySet shouldBe Set("head", "middle", "tail")
    val n = byBucket.values.map(_._1).sum
    n shouldBe graft.Tables.documents(spark, sf)
      .filter(functions.size(split(col("text"), " ")) >= 2).count()
    // head rate is 100 -> every head doc kept; tail rate 10 -> strictly fewer
    byBucket("head")._2 shouldBe byBucket("head")._1
    byBucket("tail")._2 should be < byBucket("tail")._1
    // tertile split: each bucket within (1/6, 1/2) of the corpus — ties can
    // shift boundaries, thirds cannot collapse
    byBucket.values.foreach { case (d, _) =>
      d should be > n / 6
      d should be < n / 2
    }
  }

  test("dup breakdown conserves the verified pair count") {
    val total = Dedup.q_minhash_lsh_pairs.fn(spark, sf).count()
    val rows = ReleaseQueries.q_dup_breakdown.fn(spark, sf).collect()
    rows.map(_.getAs[Long]("n_pairs")).sum shouldBe total
    // source_a <= source_b: the matrix is upper-triangular
    rows.foreach { r =>
      r.getAs[String]("source_a") should be <= r.getAs[String]("source_b")
    }
  }

  test("dataset card covers every source and conserves doc counts") {
    val card = ReleaseQueries.q_dataset_card.fn(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    card.agg(sum("n_docs")).collect()(0).getLong(0) shouldBe docs.count()
    card.count() shouldBe docs.select("source").distinct().count()
    card.filter(col("n_tokens") <= 0 || col("total_chars") <= 0).count() shouldBe 0
  }

  test("oov rate: token counts conserve; zero OOV under a full vocabulary") {
    val oov = ReleaseQueries.q_oov_rate.fn(spark, sf)
    val totalToks = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    oov.agg(sum("n_tokens")).collect()(0).getLong(0) shouldBe totalToks
    // the top-16 vocab leaves real OOV mass on this 31-token corpus
    oov.agg(sum("n_oov")).collect()(0).getLong(0) should be > 0L
    oov.collect().foreach { r =>
      r.getAs[Long]("n_oov") should be <= r.getAs[Long]("n_tokens")
      r.getAs[Long]("oov_ppm") should be <= 1000000L
    }
  }
}
