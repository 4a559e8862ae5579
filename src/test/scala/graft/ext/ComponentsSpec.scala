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

  /** Run `f` with the single-task union-find fallback disabled, so the
    * hash-min + pointer-jumping dataflow is the path under test.
    */
  private def forceDistributed[A](f: => A): A = {
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
    try f finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
  }

  test("a chain needs multiple propagation rounds and still collapses to its min") {
    // 9 <- 8 <- ... <- 1: min label must travel the full diameter
    val chain = (1L to 8L).map(i => (i, i + 1))
    val got = forceDistributed(cc(chain))
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

  test("random graphs match a driver-side union-find reference (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference: union-find with union-by-min, so every root IS the
      // component's min id — the same label the distributed fixpoint owes
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      withClue(s"seed=$seed (single-task path): ") { cc(edges) shouldBe expected }
      withClue(s"seed=$seed (dataflow path): ") {
        forceDistributed(cc(edges)) shouldBe expected
      }
    }
  }

  test("pointer jumping closes a depth-64 chain in O(log d) rounds, not 64") {
    val chain = (1L to 64L).map(i => (i, i + 1))
    val (df, rounds) = forceDistributed {
      val (d, r) =
        Components.connectedComponentsWithRounds(chain.toDF("a", "b"), "a", "b")
      (d.collect(), r)
    }
    df.map(_.getLong(1)).toSet shouldBe Set(1L)
    // reach roughly doubles per round; +1 detection round, +slack for the
    // first identity round — far under the 65 plain hash-min would need
    rounds should be > 0
    rounds should be <= 10
  }

  test("an unconverged graph throws instead of emitting partial components") {
    // diameter 5 cannot converge in 2 rounds (round 1 halves it at best);
    // the single-task path has no rounds — force the dataflow
    val chain = (1L to 5L).map(i => (i, i + 1))
    an[IllegalArgumentException] should be thrownBy
      forceDistributed(cc(chain, maxRounds = 2))
  }
}
