package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Unit coverage for [[Components.connectedComponents]] — the cluster
  * collapse behind q_dedup_components. The declared query's oracle only
  * exercises the near-clique shape LSH emits; these pin the general
  * contract: chains (multi-round propagation), disjoint clusters,
  * duplicate/reversed edges, empty input, and the non-convergence guard.
  */
class ComponentsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxRounds: Int = 25): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain needs multiple propagation rounds and still collapses to its min") {
    // 9 <- 8 <- ... <- 1: min label must travel the full diameter
    val chain = (1L to 8L).map(i => (i, i + 1))
    val got = cc(chain)
    got.keySet shouldBe (1L to 9L).toSet
    got.values.toSet shouldBe Set(1L)
  }

  test("disjoint clusters keep distinct canonical ids") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    got shouldBe Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L)
  }

  test("duplicate and reversed edges do not change the fixpoint") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("empty input yields an empty result, not a hang or NPE") {
    cc(Seq.empty) shouldBe Map.empty
  }

  test("an unconverged graph throws instead of emitting partial components") {
    // diameter 5 cannot converge in 2 rounds (round 1 halves it at best)
    val chain = (1L to 5L).map(i => (i, i + 1))
    an[IllegalArgumentException] should be thrownBy cc(chain, maxRounds = 2)
  }
}
