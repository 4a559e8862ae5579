package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Cross-operator consistency: invariants that tie INDEPENDENT catalog
  * queries together. Each query hash-matches its own oracle; these tests
  * pin the relationships BETWEEN queries that the per-query gate can't
  * see — a dedup apply that kept two members of one cluster, a corpus
  * filter that let a contaminated doc through, or a mixture whose kept
  * counts drift from the tertile scorer would pass every row hash and
  * still ship a broken corpus.
  */
class CrossQuerySpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.01"

  test("dedup apply keeps exactly one doc per near-dup cluster, and all singletons") {
    val comps = graft.ext.Dedup.q_dedup_components.fn(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val kept = graft.ext.Dedup.q_dedup_apply.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every multi-member cluster contributes exactly its min id
    comps.groupBy(_._2).foreach { case (cid, members) =>
      val ids = members.map(_._1).toSet
      withClue(s"cluster $cid: ") { (ids & kept) shouldBe Set(ids.min) }
    }
    // docs in no cluster are all kept
    val clustered = comps.map(_._1).toSet
    (all -- clustered -- kept) shouldBe empty
  }

  test("corpus filter output contains no contaminated doc and no dropped near-dup") {
    val finalKeep = graft.ext.ExtQueries.q_corpus_filter.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // q_decontaminate flags docs whose shingle hits reach 10% of their
    // shingles — the same bar the capstone filter's drop_set uses; no
    // flagged doc may survive the filter
    val contaminated = graft.ext.ExtQueries.q_decontaminate.fn(spark, dir)
      .filter("flagged").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    (finalKeep & contaminated) shouldBe empty
    // and of every verified near-dup pair, at most one side survives
    val pairs = graft.ext.Dedup.q_minhash_lsh_pairs.fn(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      withClue(s"pair ($a,$b): ") {
        (finalKeep.contains(a) && finalKeep.contains(b)) shouldBe false
      }
    }
  }

  test("quality-mix kept counts are consistent with the LM-score tertiles") {
    // q_quality_mix keeps head at 100%, middle at ~50%, tail at ~10% via
    // md5 decisions — the per-bucket kept/total ratios must sit near
    // those rates (exact md5 decision, so bounds are loose but real)
    val mix = graft.ext.ReleaseQueries.q_quality_mix.fn(spark, dir)
      .select("bucket", "n_docs", "n_kept").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the report grains by (bucket, source): roll sources up per bucket
    val byBucket = mix.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    byBucket.keySet shouldBe Set("head", "middle", "tail")
    val (hn, hk) = byBucket("head"); hk shouldBe hn
    val (mn, mk) = byBucket("middle")
    mk.toDouble / mn should (be >= 0.35 and be <= 0.65)
    val (tn, tk) = byBucket("tail")
    tk.toDouble / tn should (be >= 0.02 and be <= 0.20)
  }

  test("split assignment, curriculum order, and weighted sample agree on the corpus") {
    // three independent md5-keyed ops must cover the same doc universe:
    // every curriculum position maps to a real doc, every sampled doc is
    // in the split report's universe, and the split proportions hold
    val all = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cur = OpsQueries.q_curriculum.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    cur shouldBe all
    val sampled = OpsQueries.q_weighted_sample.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (sampled -- all) shouldBe empty
    val split = graft.queries.AnalyticsQueries.q_train_test_split.fn(spark, dir)
      .select("split", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    split.values.sum shouldBe all.size.toLong
    split("train").toDouble / all.size should (be >= 0.85 and be <= 0.95)
  }
}
