package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Triangle counting and integer PageRank ([[GraphAnalytics]]).
  *
  * The triangle tests pin the orientation-invariance claim the oracle
  * relies on: the degree-ordered Spark plan and a naive id-ordered
  * reference enumeration must agree on PER-NODE counts for any graph.
  */
class GraphAnalyticsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toSeq.toDF("a", "b")

  /** Naive reference: id-oriented wedge join, no degree trick. */
  private def naiveCounts(e: DataFrame): Map[Long, Long] = {
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .join(e.alias("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("u"), col("e1.b").as("v"), col("e2.b").as("w"))
    tri.select(col("u").as("p")).unionAll(tri.select(col("v").as("p")))
      .unionAll(tri.select(col("w").as("p")))
      .groupBy("p").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every vertex sits in C(3,2) = 3 triangles") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = GraphAnalytics.triangleCounts(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("pendant and isolated-from-triangle vertices are absent from the output") {
    // triangle 1-2-3 plus a path 3-4-5: only 1,2,3 participate
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = GraphAnalytics.triangleCounts(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("degree-ordered counts equal naive id-ordered counts on a skewed graph") {
    // hub 0 connected to 1..30, ring chords among 1..30 — the shape where
    // id-orientation piles all wedges on the hub but counts must agree
    val hub = (1L to 30L).map(i => (0L, i))
    val chords = (1L to 29L).map(i => (i, i + 1)) :+ (1L, 30L)
    val g = edges((hub ++ chords): _*)
    val got = GraphAnalytics.triangleCounts(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe naiveCounts(g)
  }

  test("property: degree-ordered == naive id-ordered counts on random graphs") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 10).foreach { _ =>
      val n = 6 + rnd.nextInt(15)
      val p = 0.2 + rnd.nextDouble() * 0.5
      val pairs = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < p
      } yield (a, b)
      if (pairs.nonEmpty) {
        val g = edges(pairs: _*)
        val got = GraphAnalytics.triangleCounts(g)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got shouldBe naiveCounts(g)
      }
    }
  }

  test("property: stored ⊕ triangleDeltaCounts == full recount on random splits") {
    val rnd = new scala.util.Random(7L)
    (1 to 8).foreach { _ =>
      val n = 8 + rnd.nextInt(10)
      val pairs = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.45
      } yield (a, b)
      if (pairs.size >= 2) {
        val (oldR, dR) = pairs.partition(_ => rnd.nextBoolean())
        val eNew = edges(pairs: _*)
        val merged = graft.state.Ivm.mergeAdditive(
          GraphAnalytics.triangleCounts(edges(oldR: _*)),
          GraphAnalytics.triangleDeltaCounts(edges(dR: _*), eNew),
          keys = Seq("part"), addCols = Seq("n_tri"))
          .filter(col("n_tri") > 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = GraphAnalytics.triangleCounts(eNew)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        merged shouldBe full
      }
    }
  }

  /** Reference k-core: sequential peel over in-memory adjacency. */
  private def refKCore(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = pairs.toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, o) => v -> o.size }
      val bad = deg.collect { case (v, d) if d < k => v }.toSet
      changed = bad.nonEmpty
      es = es.filterNot(e => bad(e._1) || bad(e._2))
    }
    es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
  }

  test("kCore: K5 with a pendant path — path peels away, K5 survives at k=3") {
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val g = edges((k5 ++ Seq((5L, 6L), (6L, 7L))): _*)
    val got = GraphAnalytics.kCore(g, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe (1L to 5L).map(_ -> 4L).toMap
  }

  test("kCore: cascading peel — chain of corners needs multiple rounds") {
    // path 1-2-3-4-5 at k=2: endpoints peel first, then the cascade
    // unzips the whole path to empty — multi-round convergence
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    GraphAnalytics.kCore(g, k = 2).collect() shouldBe empty
    // same path plus a closing edge = cycle: everything survives at k=2
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    val got = GraphAnalytics.kCore(cyc, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe (1L to 5L).map(_ -> 2L).toMap
  }

  /** Run `f` with the single-task fallback disabled, so the distributed
    * delta-peel path is the one under test.
    */
  private def forceDistributed[A](f: => A): A = {
    spark.conf.set("spark.graft.kcore.localEdgeLimit", "0")
    try f finally spark.conf.unset("spark.graft.kcore.localEdgeLimit")
  }

  test("kCore: maxRounds exceeded fails loudly (distributed path)") {
    // k=2 peel of a path unzips one vertex pair per round — a length-9
    // path needs 4 peel rounds, so maxRounds=2 must throw. The
    // single-task path has no rounds; force the dataflow peel.
    val g = edges((1L to 9L).map(i => (i, i + 1)): _*)
    val ex = intercept[IllegalArgumentException] {
      forceDistributed(GraphAnalytics.kCore(g, k = 2, maxRounds = 2).collect())
    }
    ex.getMessage should include("maxRounds")
  }

  test("property: kCore == sequential reference peel on random graphs, BOTH paths") {
    val rnd = new scala.util.Random(580L)
    (1 to 6).foreach { _ =>
      val n = 8 + rnd.nextInt(10)
      val pairs = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.35
      } yield (a, b)
      if (pairs.nonEmpty) {
        val k = 2 + rnd.nextInt(3)
        val expect = refKCore(pairs, k)
        def run() = GraphAnalytics.kCore(edges(pairs: _*), k, maxRounds = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        run() shouldBe expect // small graph: single-task peel
        forceDistributed(run()) shouldBe expect // delta-peel dataflow
      }
    }
  }

  test("property: pagerank local twin == dataflow, bit-identical, random graphs") {
    val rnd = new scala.util.Random(77L)
    (1 to 3).foreach { _ =>
      val n = 6 + rnd.nextInt(8)
      val pairs = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)) ++ Seq((1L, 2L)) // never empty
      def run() = GraphAnalytics.pageRankInt(edges(pairs: _*), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = run()
      spark.conf.set("spark.graft.pagerank.localEdgeLimit", "0")
      val dist = try run() finally spark.conf.unset("spark.graft.pagerank.localEdgeLimit")
      local shouldBe dist // same integer lattice, step for step
    }
  }

  test("property: label propagation local twin == dataflow, random graphs") {
    val rnd = new scala.util.Random(78L)
    (1 to 3).foreach { _ =>
      val n = 6 + rnd.nextInt(8)
      val pairs = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)) ++ Seq((1L, 2L))
      def run() = GraphAnalytics.labelPropagation(edges(pairs: _*), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = run()
      spark.conf.set("spark.graft.labelprop.localEdgeLimit", "0")
      val dist = try run() finally spark.conf.unset("spark.graft.labelprop.localEdgeLimit")
      local shouldBe dist
    }
  }

  test("pagerank: star center outranks leaves; ranks are deterministic") {
    val star = edges((1L to 10L).map(i => (0L, i)): _*)
    val r1 = GraphAnalytics.pageRankInt(star, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val center = r1(0L)
    (1L to 10L).foreach { leaf => center should be > r1(leaf) }
    // bit-identical on a rerun — the integer-lattice determinism claim
    val r2 = GraphAnalytics.pageRankInt(star, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    r2 shouldBe r1
  }

  test("pagerank: regular graph (ring) keeps every vertex at the uniform rank") {
    // on a d-regular graph uniform rank is the exact fixpoint of the
    // integer iteration: each vertex receives deg * (r div deg) back
    val ring = edges(((1L to 9L).map(i => (i, i + 1)) :+ (1L, 10L)): _*)
    val got = GraphAnalytics.pageRankInt(ring, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.values.toSet.size shouldBe 1
    got(1L) shouldBe 1000000L // scale: uniform start is already the fixpoint
  }
}
