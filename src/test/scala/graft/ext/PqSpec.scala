package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkSpec, Tables}

/** PQ semantics the hash gate can't articulate: the compressed index is
  * really M small codes per vector, and ADC over it really finds near
  * neighbors (recall vs the exact L2 scan, pinned).
  */
class PqSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.01"

  test("codes: every vector gets M codes drawn from <=Ksub centroids per subspace") {
    val codes = Pq.q_pq_codes.fn(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    codes.count() shouldBe n
    for (s <- 0 until 4) {
      val k = codes.select(countDistinct(col(s"c$s"))).head().getLong(0)
      k should be <= 16L
      k should be >= 2L // training produced a real partition, not one blob
    }
  }

  test("shortlist+re-rank recall@3 beats raw ADC and meets the pinned floor") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("v"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val exact = e.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), l2.as("d"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("d"), col("vec_id"), 3).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val raw = recallOf(Pq.q_pq_adc.fn(spark, sf))
    val rer = recallOf(Pq.q_pq_rerank.fn(spark, sf))
    info(f"recall@3: raw ADC $raw%.2f, shortlist+re-rank $rer%.2f")
    // raw ADC collapses on this corpus BY CONSTRUCTION (10 tight label
    // clusters -> cluster members share the query's code tuple, distances
    // tie exactly, and the id tiebreak picks the "top" 3: measured 0.13).
    // The re-rank path (R=50 shortlist, exact re-rank: measured 0.73) is
    // the production read; the pins are regression floors AND the ordering
    // claim raw < rerank — the documented reason q_pq_rerank exists.
    rer should be >= 0.6
    rer should be > raw
    // the composed IVFADC read path (probe → cell-pruned residual ADC →
    // exact re-rank) scans only nprobe cells' codes, so its recall is
    // bounded by the PROBE CEILING: exact L2 search restricted to the
    // probed cells. The pin is the no-loss invariant — the residual-ADC
    // shortlist + re-rank recovers EVERYTHING reachable inside the probe
    // (a shortlist that dropped a reachable neighbor, e.g. R below the
    // corpus's tie-group width, fails here) — plus the gross floors.
    val ivf = Similarity.ivfIndex(spark, sf)
    val qn = ivf.e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    import org.apache.spark.sql.expressions.Window
    val probe = qn.crossJoin(broadcast(ivf.cents))
      .withColumn("prk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy((Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).desc,
          col("cell"))))
      .filter(col("prk") <= IvfPq.NProbe)
      .select(col("query_id"), col("cell"))
    val ceilingDf = ivf.ec.select(col("vec_id"), col("cell"), col("v"))
      .join(broadcast(probe), "cell")
      .join(broadcast(qn.select(col("query_id"), col("qv"))), "query_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), l2.as("d"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("d"), col("vec_id"), 3).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"))
    val ceiling = recallOf(ceilingDf)
    val ivfadc = recallOf(IvfPq.q_ivfpq_search.fn(spark, sf))
    info(f"recall@3: IVFADC (cell-pruned) $ivfadc%.2f, probe ceiling $ceiling%.2f")
    ivfadc shouldBe ceiling
    ivfadc should be >= 0.5
    ivfadc should be > raw
    // OPQ (rotation + PQ + same R=50 shortlist + exact re-rank): the
    // rotation decorrelates/balances subspace variance, so the ADC
    // shortlist is no worse at recovering true neighbors than the
    // unrotated PQ path on the same corpus — the CVPR-2013 claim, pinned
    // per-instance here alongside the gross floor.
    val opq = recallOf(Opq.q_opq_search.fn(spark, sf))
    info(f"recall@3: OPQ shortlist+re-rank $opq%.2f (plain PQ $rer%.2f, IVFADC $ivfadc%.2f)")
    opq should be >= rer
    opq should be >= 0.6
  }

  test("nprobe sweep 1..8: recall/scan-cost curve; shortlist loses nothing " +
      "at ANY depth, so residual-space rotation cannot pay on this corpus") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("v"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    def top3(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), l2.as("d"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("d"), col("vec_id"), 3).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top3(e.crossJoin(broadcast(q)))
    val ivf = Similarity.ivfIndex(spark, sf)
    val qn = ivf.e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val nlist = ivf.cents.count().toInt
    val sweep = (1 to math.min(8, nlist)).map { np =>
      val probe = qn.crossJoin(broadcast(ivf.cents))
        .withColumn("prk", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy((Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).desc,
            col("cell"))))
        .filter(col("prk") <= np)
        .select(col("query_id"), col("cell"))
      val probed = ivf.ec.select(col("vec_id"), col("cell"), col("v"))
        .join(broadcast(probe), "cell")
        .join(broadcast(qn.select(col("query_id"), col("qv"))), "query_id")
      // scan cost: the code rows the cell-pruned ADC reads at this depth
      val scanned = probed.filter(col("query_id") =!= col("vec_id")).count()
      val ceiling = (exact & top3(probed)).size.toDouble / exact.size
      val got = IvfPq.searchAt(spark, sf, np)
        .select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfadc = (exact & got).size.toDouble / exact.size
      info(f"nprobe=$np: ceiling $ceiling%.2f, IVFADC $ivfadc%.2f, scanned $scanned rows")
      (np, ceiling, ivfadc, scanned)
    }
    // the curve: ceiling is non-decreasing in probe depth and the scan
    // cost strictly grows — the recall/cost tradeoff an operator tunes
    sweep.sliding(2).foreach {
      case Seq((_, c0, _, s0), (_, c1, _, s1)) =>
        c1 should be >= c0
        s1 should be > s0
      case _ => ()
    }
    // the no-loss invariant through the PRODUCTION depth: at np ≤ NProbe
    // the residual-ADC shortlist + exact re-rank recovers everything
    // reachable inside the probe — rotation in residual space has NOTHING
    // to recover there (confirming r12's decision not to compose it).
    sweep.foreach { case (np, ceiling, ivfadc, scanned) =>
      if (np <= IvfPq.NProbe)
        withClue(s"nprobe=$np: ") { ivfadc shouldBe ceiling }
      else {
        // measured at np ≥ 4 (VERDICT r12 #5, the sweep's answer): the
        // R=128 shortlist becomes a MINORITY of the scanned candidates
        // (~500/query at np=4) and the ADC ordering drops a reachable
        // true neighbor — recall falls below the ceiling (0.93 vs 1.00
        // at np=4 on this corpus). THIS is the depth where
        // rotation-in-residual-space (better ADC ordering) — or simply a
        // wider shortlist — starts to have headroom.
        withClue(s"nprobe=$np: ") {
          ivfadc should be <= ceiling
          if (ivfadc < ceiling)
            scanned / 5 should be > IvfPq.Shortlist.toLong
        }
      }
    }
    // the measured loss point exists on this corpus and is AFTER the
    // production depth — pin both so a regression either way is loud
    val lossy = sweep.filter(s => s._3 < s._2).map(_._1)
    lossy should not be empty
    all(lossy) should be > IvfPq.NProbe
    // probing every cell reaches an exact-search ceiling
    if (nlist <= 8) sweep.last._2 shouldBe 1.0
  }

  test("OPQ rotation is orthonormal and norm-preserving") {
    val e = Similarity.embFrame(spark, sf)
    val r = Opq.trainRotation(e)
    r.size shouldBe 64
    // R Rᵀ = I (rows are the permuted eigenvector columns of a symmetric
    // matrix, orthonormal up to Jacobi fp error)
    for (i <- 0 until 64 by 9; j <- 0 until 64 by 9) {
      val d = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      d shouldBe (if (i == j) 1.0 else 0.0) +- 1e-9
    }
    // rotation preserves L2 norms (spot-check through the Column path)
    val got = e.limit(7)
      .select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"),
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (x, y) => x + y).as("n0"),
        aggregate(zip_with(Opq.rotate(col("v"), r), Opq.rotate(col("v"), r),
          (a, b) => a * b), lit(0.0), (x, y) => x + y).as("n1"))
      .collect()
    got.foreach { row =>
      row.getDouble(2) shouldBe row.getDouble(1) +- 1e-9
    }
  }
}
