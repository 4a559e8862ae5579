package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Structural properties of the ops family that the row-hash oracle can't
  * state directly: the curriculum index is a band-monotone permutation, the
  * weighted sample is weight-biased, the transition matrix rows are
  * probability-complete.
  */
class OpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("curriculum train_pos is a dense 1..N permutation, monotone in band") {
    val rows = OpsQueries.q_curriculum.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    rows.map(_._3).sorted shouldBe (1L to n.toLong).toArray
    // positions ordered by train_pos must never see band decrease
    val bandsInOrder = rows.sortBy(_._3).map(_._2)
    bandsInOrder.zip(bandsInOrder.tail).forall { case (a, b) => a <= b } shouldBe true
  }

  test("weighted sample favors heavy docs: sampled mean n_chars > corpus mean") {
    // md5-priority div weight makes heavier docs stochastically earlier.
    // sf0.01 deliberately, not the suite's sf0.001: the bias is only
    // observable when k=50 UNDERSAMPLES each stratum (sf0.001 strata have
    // ≤50 docs, so the sample is the whole stratum and the means tie)
    val d01 = "/root/testdata/sf0.01"
    val sampled = OpsQueries.q_weighted_sample.fn(spark, d01)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val corpus = graft.Tables.documents(spark, d01)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    sampled should be > corpus
  }

  test("transition matrix probabilities sum to ~1e6 ppm per from_type") {
    val sums = OpsQueries.q_transition_matrix.fn(spark, dir)
      .groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("prob_ppm").as("s"))
      .collect().map(_.getLong(1))
    // integral div floors each term: the per-row loss is < 1 ppm, so with
    // ≤5 to_types the sum sits in (1e6 - 5, 1e6]
    all(sums) should (be <= 1000000L and be > 999995L)
  }

  test("compaction plan never emits zero files and respects the 64k target") {
    val rows = OpsQueries.q_compaction_plan.fn(spark, dir).collect()
    rows.foreach { r =>
      val sumChars = r.getLong(3); val nFiles = r.getLong(5)
      nFiles should be >= 1L
      nFiles shouldBe (sumChars + 63999) / 64000
    }
  }
}
