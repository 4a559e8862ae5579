package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef

/** Optimized Product Quantization (OPQ) — the learned rotation ahead of
  * PQ coding (public: Ge, He, Ke, Sun, "Optimized Product Quantization
  * for Approximate Nearest Neighbor Search", CVPR 2013; the PARAMETRIC
  * variant): plain PQ quantizes each 16-dim slice independently, so a
  * corpus whose variance is concentrated in a few dimensions wastes most
  * of its code budget; OPQ first applies an orthogonal rotation R that
  * (a) decorrelates dimensions (PCA) and (b) BALANCES variance across
  * the M subspaces (eigenvalue allocation), then trains the ordinary PQ
  * codebooks on the rotated vectors. Search rotates the query once and
  * proceeds exactly as PQ-ADC; distances are preserved because R is
  * orthogonal.
  *
  * Determinism contract (the same bit-reproducibility as the Lloyd's
  * trainer, so codes hash-match DuckDB): the rotation is trained on the
  * md5-ranked 256-vector sample (the shared seeded-sample rule), the
  * covariance is a fixed-order (vec_id-ascending) fold, the eigensolver
  * is FIXED-ITERATION cyclic Jacobi (6 full (p,q) sweeps, |a_pq| ≤ 1e-11
  * skip guard, c/s from the textbook tau→t→c formulas with an explicit
  * multiplication order), components sort by (eigenvalue DESC, index
  * ASC), and the subspace allocation is the paper's greedy
  * product-balance — tracked as a raw product (clamped at 1e-12), never
  * a log, because IEEE only guarantees correct rounding for *,/,sqrt.
  * Every step is replayed bit-for-bit by the oracle's recursive CTEs.
  *
  * Scale shape: training collects the BOUNDED sample (256×64) and runs
  * Jacobi on the driver (64×64, milliseconds); the rotation is a pure
  * projection with R as plan literals (4096 multiply-adds per vector,
  * codegen'd, zero shuffle); codebook training and coding reuse the PQ
  * machinery unchanged; search is the same broadcast-join + bounded
  * TopKOrdered shape as q_pq_rerank. Nothing corpus-sized ever reaches
  * the driver.
  */
object Opq {

  private val Dim = 64
  private val M = Pq.M
  private val SubDim = Dim / M
  private val NSample = 256
  private val Sweeps = 6
  private val SkipTol = 1e-11
  private val LamClamp = 1e-12
  private val NQueries = 5
  private val TopK = 3
  private val Shortlist = 50

  /** Train the OPQ rotation: sampled covariance → cyclic Jacobi →
    * eigenvalue allocation. Returns R as rows in OUTPUT-dimension order
    * (row i = the eigenvector column assigned to output dim i), so
    * rotated(x)_i = Σ_j R(i)(j)·x_j.
    */
  private[ext] def trainRotation(e: DataFrame): Seq[Seq[Double]] = {
    val sample = e
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      .limit(NSample)
      .select(col("vec_id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1) // covariance folds in vec_id order, not sample-rank order
      .map(_._2)
    val n = sample.length
    // empty/degenerate corpus: identity rotation keeps every consumer typed
    if (n == 0) return Seq.tabulate(Dim)(i => Seq.tabulate(Dim)(j => if (i == j) 1.0 else 0.0))
    val mu = Array.tabulate(Dim) { j =>
      var s = 0.0
      sample.foreach(r => s += r(j))
      s / n
    }
    var a = Array.tabulate(Dim, Dim) { (i, j) =>
      var s = 0.0
      sample.foreach(r => s += (r(i) - mu(i)) * (r(j) - mu(j)))
      s / n
    }
    val v = Array.tabulate(Dim, Dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until Sweeps; p <- 0 until Dim - 1; q <- p + 1 until Dim) {
      val apq = a(p)(q)
      if (math.abs(apq) > SkipTol) {
        val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = (if (tau >= 0.0) 1.0 else -1.0) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
        val c = 1.0 / math.sqrt(1.0 + t * t)
        val s = t * c
        // row rotation into a copy, then column rotation — the explicit
        // two-pass order the oracle's CTE layers replicate
        val b = Array.tabulate(Dim, Dim) { (i, k) =>
          if (i == p) c * a(p)(k) - s * a(q)(k)
          else if (i == q) s * a(p)(k) + c * a(q)(k)
          else a(i)(k)
        }
        a = Array.tabulate(Dim, Dim) { (i, k) =>
          if (k == p) c * b(i)(p) - s * b(i)(q)
          else if (k == q) s * b(i)(p) + c * b(i)(q)
          else b(i)(k)
        }
        for (k <- 0 until Dim) {
          val vkp = c * v(k)(p) - s * v(k)(q)
          val vkq = s * v(k)(p) + c * v(k)(q)
          v(k)(p) = vkp
          v(k)(q) = vkq
        }
      }
    }
    val lam = Array.tabulate(Dim)(i => a(i)(i))
    val order = (0 until Dim).sortBy(i => (-lam(i), i))
    // greedy product balance: next component goes to the open subspace
    // with the smallest eigenvalue product (ties → smallest index)
    val prods = Array.fill(M)(1.0)
    val buckets = Array.fill(M)(Vector.empty[Int])
    order.foreach { comp =>
      var best = -1
      for (s <- 0 until M)
        if (buckets(s).size < SubDim && (best < 0 || prods(s) < prods(best)))
          best = s
      buckets(best) :+= comp
      prods(best) *= math.max(lam(comp), LamClamp)
    }
    val finalOrder = buckets.toSeq.flatten
    finalOrder.map(c => Seq.tabulate(Dim)(j => v(j)(c)))
  }

  /** Rotate a 64-dim vector column by the literal R — one fixed-order
    * multiply-add fold per output dimension, all inside codegen.
    */
  private[ext] def rotate(vc: org.apache.spark.sql.Column,
      r: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    array(r.map { row =>
      aggregate(zip_with(typedlit(row), vc, (a, b) => a * b.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  /** The session-cached trained index: R + PQ books + corpus codes over
    * the rotated frame (rebuilt per JVM, like the PQ index's train path;
    * persistence stays the H65 store's concern).
    */
  private final case class OpqIndex(r: Seq[Seq[Double]],
      books: Seq[Seq[(Long, Seq[Double])]], codes: DataFrame, rot: DataFrame)

  private val cache = new graft.SessionCache[String, OpqIndex]

  private def opqIndex(s: SparkSession, dir: String): OpqIndex =
    cache.getOrBuild(s, dir) {
      graft.Materialize.timed("opq_index") {
        val e = Similarity.embFrame(s, dir).localCheckpoint(true)
        val r = trainRotation(e)
        val rot = e.select(col("vec_id"), rotate(col("v"), r).as("v"))
          .localCheckpoint(true)
        val books = Pq.trainBooks(rot)
        val codes = Pq.codesOf(rot, books).localCheckpoint(true)
        OpqIndex(r, books, codes, rot)
      }
    }

  // ---- the oracle's bit-exact replay (recursive CTEs) ---------------------------

  /** Rotation pipeline: raw embeddings → sampled covariance → Jacobi →
    * allocation → the ROTATED frame as CTE `e` (so [[Pq.subSql]]'s
    * training replay runs unchanged on top). MATERIALIZED hints keep
    * DuckDB from re-running the recursion at every downstream reference.
    */
  private def rotSql: String = {
    val steps = Sweeps * (Dim * (Dim - 1) / 2)
    s"""e0 AS (SELECT vec_id, embedding AS v FROM embeddings),
       |rs0 AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM e0),
       |smp AS (SELECT e0.vec_id,
       |    list_transform(range(1, ${Dim + 1}), i -> CAST(v[i] AS DOUBLE)) AS x
       |  FROM e0 JOIN rs0 USING (vec_id) WHERE rk <= $NSample),
       |xs AS (SELECT array_agg(x ORDER BY vec_id) AS xs, count(*) AS n FROM smp),
       |mus AS MATERIALIZED (SELECT xs, n, list_transform(range(1, ${Dim + 1}), j ->
       |    list_reduce(list_transform(xs, r -> r[j]), (a, b) -> a + b) / n) AS mu
       |  FROM xs),
       |cov AS MATERIALIZED (SELECT list_transform(range(1, ${Dim + 1}), i ->
       |    list_transform(range(1, ${Dim + 1}), j ->
       |      list_reduce(list_transform(xs, r -> (r[i] - mu[i]) * (r[j] - mu[j])),
       |        (a, b) -> a + b) / n)) AS a
       |  FROM mus),
       |idm AS (SELECT list_transform(range(1, ${Dim + 1}), i ->
       |    list_transform(range(1, ${Dim + 1}), j ->
       |      CASE WHEN i = j THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)) AS vv),
       |prs AS (SELECT row_number() OVER (ORDER BY p, q) - 1 AS idx, p + 1 AS pp, q + 1 AS qq
       |  FROM (SELECT a.range AS p, b.range AS q FROM range(0, $Dim) a, range(0, $Dim) b
       |        WHERE b.range > a.range)),
       |jac AS (
       |  SELECT 0 AS step, cov.a AS a, idm.vv AS vv FROM cov, idm
       |  UNION ALL
       |  SELECT step + 1,
       |    CASE WHEN skip THEN a ELSE
       |      list_transform(bmat, row -> list_transform(range(1, ${Dim + 1}), k ->
       |        CASE WHEN k = pp THEN cc * row[pp] - ss * row[qq]
       |             WHEN k = qq THEN ss * row[pp] + cc * row[qq]
       |             ELSE row[k] END)) END,
       |    CASE WHEN skip THEN vv ELSE
       |      list_transform(vv, row -> list_transform(range(1, ${Dim + 1}), k ->
       |        CASE WHEN k = pp THEN cc * row[pp] - ss * row[qq]
       |             WHEN k = qq THEN ss * row[pp] + cc * row[qq]
       |             ELSE row[k] END)) END
       |  FROM (
       |    SELECT step, a, vv, pp, qq, skip, cc, ss,
       |      CASE WHEN skip THEN a ELSE
       |        list_transform(range(1, ${Dim + 1}), i ->
       |          CASE WHEN i = pp THEN list_transform(range(1, ${Dim + 1}), k -> cc * a[pp][k] - ss * a[qq][k])
       |               WHEN i = qq THEN list_transform(range(1, ${Dim + 1}), k -> ss * a[pp][k] + cc * a[qq][k])
       |               ELSE a[i] END) END AS bmat
       |    FROM (
       |      SELECT step, a, vv, pp, qq, skip, cc, tt * cc AS ss
       |      FROM (
       |        SELECT step, a, vv, pp, qq, skip, tt, 1.0 / sqrt(1.0 + tt * tt) AS cc
       |        FROM (
       |          SELECT step, a, vv, pp, qq, skip,
       |            CASE WHEN skip THEN 0.0 ELSE
       |              (CASE WHEN tau >= 0.0 THEN 1.0 ELSE -1.0 END)
       |                / (abs(tau) + sqrt(1.0 + tau * tau)) END AS tt
       |          FROM (
       |            SELECT step, a, vv, pp, qq, abs(a[pp][qq]) <= $SkipTol AS skip,
       |              CASE WHEN abs(a[pp][qq]) <= $SkipTol THEN 0.0
       |                   ELSE (a[qq][qq] - a[pp][pp]) / (2.0 * a[pp][qq]) END AS tau
       |            FROM jac JOIN prs ON prs.idx = jac.step % ${Dim * (Dim - 1) / 2}
       |            WHERE jac.step < $steps
       |          )
       |        )
       |      )
       |    )
       |  )
       |),
       |eig AS MATERIALIZED (SELECT a, vv FROM jac WHERE step = $steps),
       |cmp AS (SELECT i, a[i][i] AS lam FROM eig, range(1, ${Dim + 1}) t(i)),
       |ord AS MATERIALIZED (SELECT i, lam,
       |    row_number() OVER (ORDER BY lam DESC, i) AS r FROM cmp),
       |alc AS (
       |  SELECT 0 AS k, [1.0, 1.0, 1.0, 1.0]::DOUBLE[] AS prods,
       |    [[], [], [], []]::BIGINT[][] AS asg
       |  UNION ALL
       |  SELECT k + 1,
       |    list_transform(range(1, ${M + 1}), s ->
       |      CASE WHEN s = best THEN prods[s] * greatest(lam, $LamClamp) ELSE prods[s] END),
       |    list_transform(range(1, ${M + 1}), s ->
       |      CASE WHEN s = best THEN list_append(asg[s], i) ELSE asg[s] END)
       |  FROM (
       |    SELECT k, prods, asg, i, lam,
       |      list_sort(list_transform([1, 2, 3, 4], s -> {p:
       |        CASE WHEN len(asg[s]) < $SubDim THEN prods[s] ELSE 1e308 END, s: s}))[1].s AS best
       |    FROM alc JOIN ord ON ord.r = alc.k + 1
       |    WHERE alc.k < $Dim
       |  )
       |),
       |fin AS MATERIALIZED (SELECT flatten(asg) AS f FROM alc WHERE k = $Dim),
       |e AS MATERIALIZED (SELECT e0.vec_id, list_transform(range(1, ${Dim + 1}), i ->
       |    list_reduce(list_transform(range(1, ${Dim + 1}), j ->
       |      vv[j][f[i]] * CAST(e0.v[j] AS DOUBLE)), (x, y) -> x + y)) AS v
       |  FROM e0, eig, fin),
       |rs AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM e)""".stripMargin
  }

  /** rotation replay + the unchanged PQ training replay over the rotated
    * frame `e` (code CTEs cod0..codM-1, codebooks cb0..cbM-1).
    */
  private def opqHeadSql: String =
    s"""$rotSql,
       |${(0 until M).map(Pq.subSql).mkString(",\n")}""".stripMargin

  // ---- q_opq_codes: the rotated compressed index ---------------------------------

  val q_opq_codes: QueryDef = QueryDef(
    s"""WITH RECURSIVE $opqHeadSql
       |SELECT e.vec_id, ${(0 until M).map(s => s"cod$s.code AS c$s").mkString(", ")}
       |FROM e ${(0 until M).map(s => s"JOIN cod$s ON cod$s.vec_id = e.vec_id").mkString(" ")}
       |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
    opqIndex(s, dir).codes.orderBy(col("vec_id"))
  }

  // ---- q_opq_search: rotated-ADC shortlist + exact re-rank ------------------------
  // The production OPQ read path: the query rotates ONCE (R is a plan
  // literal), the ADC shortlist scans the rotated codes, and the exact
  // re-rank fetches ORIGINAL full-precision vectors — rotation preserves
  // L2, so the final distances are the unrotated geometry the caller
  // expects.

  val q_opq_search: QueryDef = QueryDef(
    s"""WITH RECURSIVE $opqHeadSql,
       |q AS (SELECT vec_id AS query_id FROM e WHERE vec_id < $NQueries),
       |sA AS (SELECT q.query_id, e.vec_id,
       |    ${(0 until M).map(s =>
              s"(SELECT ${Pq.duckDistSql(s"eq$s.vs", "cbq.cv")} FROM es$s eq$s, cb$s cbq, cod$s cdq " +
              s"WHERE eq$s.vec_id = q.query_id AND cdq.vec_id = e.vec_id AND cbq.code = cdq.code)")
              .mkString("\n    + ")} AS adist
       |  FROM q, e WHERE q.query_id <> e.vec_id),
       |sh AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, vec_id) AS srk
       |  FROM sA) WHERE srk <= $Shortlist),
       |x AS (SELECT sh.query_id, sh.vec_id,
       |    list_reduce(list_transform(range(1, ${Dim + 1}), i ->
       |      (CAST(eq.v[i] AS DOUBLE) - CAST(ev.v[i] AS DOUBLE))
       |      * (CAST(eq.v[i] AS DOUBLE) - CAST(ev.v[i] AS DOUBLE))), (a, b) -> a + b) AS d
       |  FROM sh JOIN e0 eq ON eq.vec_id = sh.query_id JOIN e0 ev ON ev.vec_id = sh.vec_id),
       |r AS (SELECT query_id, vec_id, d,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id) AS INT) AS rnk
       |  FROM x)
       |SELECT query_id, vec_id, round(d, 6) AS dist, rnk
       |FROM r WHERE rnk <= $TopK
       |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
    val idx = opqIndex(s, dir)
    val e0 = Similarity.embFrame(s, dir)
    // queries rotate once through the literal R
    val q = idx.rot.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val books = idx.books.map(b =>
      map(b.flatMap { case (id, cv) => Seq(lit(id), typedlit(cv)) }: _*))
    val adist = (0 until M).map { sub =>
      Pq.distSq(Pq.subVec(col("qv"), sub), element_at(books(sub), col(s"c$sub")))
    }.reduce(_ + _)
    val short = idx.codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), adist.as("adist"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("adist"), col("vec_id"), Shortlist).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t").getField("id").as("vec_id"))
    // exact re-rank on ORIGINAL vectors
    val qOrig = e0.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv0"))
    val exact = aggregate(zip_with(col("qv0"), col("v"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    short
      .join(e0.select(col("vec_id"), col("v")), "vec_id")
      .join(broadcast(qOrig), "query_id")
      .select(col("query_id"), exact.as("d"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("d"), col("vec_id"), TopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t").getField("id").as("vec_id"),
        round(-col("t").getField("score"), 6).as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_opq_codes" -> q_opq_codes,
    "q_opq_search" -> q_opq_search)
}
