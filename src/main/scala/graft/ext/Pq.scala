package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Product quantization (PQ) — the compression half of the canonical
  * billion-scale ANN design (IVF routes, PQ compresses; Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011). The
  * vector splits into M subspaces; each subspace gets its own small
  * codebook (deterministic Lloyd's, L2 metric); a vector is stored as M
  * small codes (here 4×16 codes = 4 bytes/vector vs 256 bytes of floats,
  * a 64× index shrink) and queries scan codes with an asymmetric distance
  * (ADC): full-precision query subvector vs the centroid each code names.
  *
  * Unlike the IVF cell count ([[Similarity.nlistFor]] tracks the corpus),
  * the codebook size is FIXED BY DESIGN: ksub is the bits-per-code
  * contract (compression ratio), not a partition-size knob — growing the
  * corpus grows cells-per-centroid, which is exactly what PQ wants
  * (quantization error is bounded by subspace geometry, not corpus size).
  *
  * Cross-engine exactness: the same fixed-order double folds as the IVF
  * k-means (assignment = strict-< argmin over id-ordered centroids ==
  * the oracle's `ORDER BY d ASC, code ASC` row_number; update = member
  * fold in vec_id order), so codes — and the ADC ranking built on them —
  * hash-match DuckDB bit-for-bit. Scale shape: training is two corpus
  * projections + ksub-row aggregates per subspace; code assignment is a
  * pure projection (codebook embedded in the plan as literals, zero
  * shuffle); ADC search joins the 5-query broadcast against the codes
  * frame and ranks with the bounded TopKOrdered aggregate.
  */
object Pq {

  private[ext] val Dim = 64
  private[ext] val M = 4 // subspaces
  private[ext] val SubDim = Dim / M
  private[ext] val Ksub = 16 // codes per subspace (4 bits) — fixed, see above
  private val Iters = 1 // Lloyd rounds after seeded init (production: more)
  private val NQueries = 5
  private val TopK = 3

  /** Float subvector of subspace `s` (1-based slice, matching the oracle's
    * index arithmetic).
    */
  private[ext] def subVec(v: Column, s: Int): Column = slice(v, s * SubDim + 1, SubDim)

  /** Squared L2 between a float subvector and a double centroid — a
    * fixed-order left fold, bit-identical to the oracle's list_reduce.
    */
  private[ext] def distSq(vs: Column, cv: Column): Column =
    aggregate(zip_with(vs, cv, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (acc, x) => acc + x)

  /** Argmin fold over an id-ordered literal codebook: strict-< keeps the
    * FIRST (= lowest id) among distance ties — the oracle's
    * `ORDER BY d ASC, code ASC`. Returns struct(id, d).
    */
  private def argminStruct(vs: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    val arr = array(cents.sortBy(_._1).map { case (id, cv) =>
      struct(lit(id).as("id"), typedlit(cv).as("cv"))
    }: _*)
    aggregate(arr,
      struct(lit(-1L).as("id"), lit(Double.MaxValue).as("d")),
      (acc, c) => {
        val d = distSq(vs, c.getField("cv"))
        when(d < acc.getField("d"),
          struct(c.getField("id").cast("long").as("id"), d.as("d"))).otherwise(acc)
      })
  }

  private[ext] def argminCode(vs: Column, cents: Seq[(Long, Seq[Double])]): Column =
    argminStruct(vs, cents).getField("id")

  /** Squared reconstruction error of a full vector against frozen
    * codebooks: Σ_s min_c ||v_s − c||² — the quantization-quality signal
    * the drift monitor watches. Pure projection (codebooks are plan
    * literals).
    */
  def reconstructionError(v: Column, books: Seq[Seq[(Long, Seq[Double])]]): Column =
    (0 until M).map(s => argminStruct(subVec(v, s), books(s)).getField("d"))
      .reduce(_ + _)

  /** The trained codebooks for external monitors (bounded: M × Ksub). */
  private[graft] def codebooks(s: SparkSession, dir: String): Seq[Seq[(Long, Seq[Double])]] =
    pqIndex(s, dir).books

  // (subCodebook was the per-subspace training loop: M chained
  // collect-per-round jobs per subspace. trainBooks below now fuses all M
  // subspaces into one job per Lloyd round — r13 optimization; math and
  // fold order unchanged, see trainBooks.)

  /** The trained index per (session, sfDir): M codebooks + the corpus
    * codes frame — materialized once, like the IVF/LSH indexes (each
    * consumer query times its SEARCH, not codebook training).
    */
  /** `storedV` — the [[Similarity]] IvfIndex revalidation contract: a
    * same-session PQ maintenance commit invalidates this cached entry.
    */
  private final case class PqIndex(books: Seq[Seq[(Long, Seq[Double])]],
      codes: DataFrame, storedV: Option[Long])

  private val cache = new graft.SessionCache[String, PqIndex]

  /** Train all M subspace codebooks over an embeddings frame
    * (vec_id, v) — shared by the session build and the persisted-index
    * maintenance path ([[VectorIndex]]).
    *
    * One Spark job per Lloyd round for ALL M subspaces (r13 optimization,
    * guide §1.2: fewer passes): the md5-ranked seeded init is a row-level
    * rank — identical for every subspace — so ONE collect of the top-Ksub
    * full vectors seeds all M books; each round then assigns every
    * subspace's argmin code in one projection, explodes to (sub, code)
    * keys and aggregates the member means in ONE groupBy. Previously this
    * was M independent chains = M × (1 + iters) sequential corpus jobs;
    * the per-group math (strict-< argmin over id-ordered literals,
    * vec_id-ordered member fold, per-element mean) is byte-identical, so
    * the trained books — and every oracle-gated consumer — are unchanged
    * (PqSpec pins the books against the from-scratch derivation).
    */
  private[ext] def trainBooks(e: DataFrame,
      iters: Int = Iters): Seq[Seq[(Long, Seq[Double])]] = {
    val initRows = e
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      .limit(Ksub)
      .select(col("vec_id"), transform(col("v"), x => x.cast("double")).as("cv"))
      .collect()
    // empty corpus: one zero codeword per subspace keeps the argmin
    // literal typed; the codes frame has no rows to assign
    if (initRows.isEmpty) return Seq.fill(M)(Seq((0L, List.fill(SubDim)(0.0))))
    var books: Seq[Seq[(Long, Seq[Double])]] = (0 until M).map { sub =>
      initRows.toSeq.map(r => (r.getLong(0),
        r.getSeq[Double](1).slice(sub * SubDim, (sub + 1) * SubDim).toList))
    }
    for (_ <- 1 to iters) {
      val codes = graft.functions.PqCodes(col("v"), books)
      val perSub = (0 until M).map { sub =>
        struct(lit(sub).as("sub"),
          element_at(codes, sub + 1).as("code"),
          subVec(col("v"), sub).as("vs"))
      }
      val rows = e
        .select(col("vec_id"), explode(array(perSub: _*)).as("sc"))
        .select(col("sc.sub").as("sub"), col("sc.code").as("code"),
          col("vec_id"), col("sc.vs").as("vs"))
        .groupBy(col("sub"), col("code"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("vs")))).as("ms"),
          count(lit(1)).as("c"))
        .select(col("sub"), col("code"), transform(
          aggregate(col("ms"), typedlit(Seq.fill(SubDim)(0.0)),
            (acc, m) => zip_with(acc, m.getField("vs"), (a, b) => a + b.cast("double"))),
          x => x / col("c")).as("cv"))
        .collect()
      books = (0 until M).map { sub =>
        rows.filter(_.getInt(0) == sub)
          .map(r => (r.getLong(1), r.getSeq[Double](2).toList))
          .sortBy(_._1).toSeq
      }
    }
    books
  }

  /** Code assignment under FROZEN codebooks — a pure projection (the
    * books ride the plan as literals), the PQ twin of
    * [[Similarity.assignCells]]. `carry` names extra input columns to
    * keep alongside the codes (the IVFADC composition carries the cell
    * id so the stored code table is cell-filterable). One native
    * [[graft.functions.PqCodes]] evaluation computes all M codes per row
    * (r13: replaces M interpreted argmin HOF folds; bit-identical
    * contract pinned on the expression).
    */
  private[ext] def codesOf(e: DataFrame, books: Seq[Seq[(Long, Seq[Double])]],
      carry: Seq[String] = Nil): DataFrame = {
    val codes = graft.functions.PqCodes(col("v"), books)
    e.select(
      (col("vec_id") +: carry.map(col)) ++
        (0 until M).map(sub => element_at(codes, sub + 1).as(s"c$sub")): _*)
  }

  private def pqIndex(s: SparkSession, dir: String): PqIndex = {
    val root = VectorIndex.storeRootFor(dir)
    def headV = graft.streaming.TableStore.latestVersion(s, s"$root/pq")
    cache.getOrBuildIf(s, dir)(_.storedV == headV) {
      val stored = headV
      if (stored.nonEmpty) graft.Materialize.timed("pq_index_load") {
        // load the persisted codebooks + codes instead of re-training —
        // same contract as Similarity.ivfIndex's load path
        PqIndex(VectorIndex.pqBooks(s, root),
          VectorIndex.pqCodes(s, root).localCheckpoint(true), stored)
      } else graft.Materialize.timed("pq_index") {
        val e = Similarity.embFrame(s, dir).localCheckpoint(true)
        val books = trainBooks(e)
        val codes = codesOf(e, books).localCheckpoint(true)
        import s.implicits._
        val bookRows = books.zipWithIndex.flatMap { case (b, sub) =>
          b.map { case (code, cv) => (sub, code, cv) }
        }
        // tagged with the version THIS build wrote — see ivfIndex
        val wrote =
          try {
            graft.streaming.TableStore.write(s, s"$root/pq", 0L,
              VectorIndex.PqSpecs,
              Map("pq_codebooks" -> bookRows.toDF("sub", "code", "cv"),
                "pq_codes" -> codes), cfg = VectorIndex.cfg)
            Some(0L)
          } catch { case ex: Exception =>
            System.err.println(s"[graft] PQ index persist failed (non-fatal): ${ex.getMessage}")
            None
          }
        PqIndex(books, codes, wrote)
      }
    }
  }

  // ---- DuckDB oracle fragments --------------------------------------------

  /** Slice CTE for subspace s: (vec_id, vs float-list). */
  private def esSql(s: Int): String =
    s"es$s AS (SELECT vec_id, list_transform(range(${s * SubDim + 1}, ${s * SubDim + SubDim + 1}), i -> v[i]) AS vs FROM e)"

  private[ext] def duckDistSql(vs: String, cv: String): String = duckDist(vs, cv)

  private def duckDist(vs: String, cv: String): String =
    s"list_reduce(list_transform(range(1, $SubDim + 1), i -> (CAST($vs[i] AS DOUBLE) - $cv[i]) * (CAST($vs[i] AS DOUBLE) - $cv[i])), (x, y) -> x + y)"

  /** One subspace's training + final assignment as CTEs ending in
    * `cod$s` = (vec_id, code) and `cb$s` = (code, cv) — the exact twin of
    * [[subCodebook]] + [[argminCode]] (seeded init via the shared `rs`
    * rank, one Lloyd round, strict argmin with id tiebreak).
    */
  private[ext] def subSql(s: Int): String =
    s"""${esSql(s)},
       |i$s AS (SELECT es.vec_id AS code,
       |    list_transform(range(1, $SubDim + 1), i -> CAST(vs[i] AS DOUBLE)) AS cv
       |  FROM es$s es JOIN rs USING (vec_id) WHERE rk <= $Ksub),
       |a$s AS (SELECT vec_id, code FROM (
       |    SELECT es.vec_id, i.code,
       |      row_number() OVER (PARTITION BY es.vec_id
       |        ORDER BY ${duckDist("es.vs", "i.cv")} ASC, i.code ASC) AS dk
       |    FROM es$s es, i$s i) WHERE dk = 1),
       |m$s AS (SELECT a$s.code, array_agg(es.vs ORDER BY es.vec_id) AS ms, count(*) AS c
       |  FROM a$s JOIN es$s es USING (vec_id) GROUP BY a$s.code),
       |cb$s AS (SELECT code, list_transform(range(1, $SubDim + 1), i ->
       |    list_reduce(list_transform(ms, mm -> CAST(mm[i] AS DOUBLE)), (x, y) -> x + y) / c) AS cv
       |  FROM m$s),
       |cod$s AS (SELECT vec_id, code FROM (
       |    SELECT es.vec_id, cb.code,
       |      row_number() OVER (PARTITION BY es.vec_id
       |        ORDER BY ${duckDist("es.vs", "cb.cv")} ASC, cb.code ASC) AS dk
       |    FROM es$s es, cb$s cb) WHERE dk = 1)""".stripMargin

  private val headSql: String =
    s"""e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |rs AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM e),
       |${(0 until M).map(subSql).mkString(",\n")}""".stripMargin

  // -- PQ codes: the compressed index itself --------------------------------
  val q_pq_codes: QueryDef = QueryDef(
    s"""WITH $headSql
       |SELECT e.vec_id, ${(0 until M).map(s => s"cod$s.code AS c$s").mkString(", ")}
       |FROM e ${(0 until M).map(s => s"JOIN cod$s ON cod$s.vec_id = e.vec_id").mkString(" ")}
       |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
    pqIndex(s, dir).codes.orderBy(col("vec_id"))
  }

  // -- ADC search: full-precision queries against the compressed corpus -----
  // Per (query, vector): adist = Σ_s ||q_s − codebook_s[code_s(x)]||².
  // The query's M×Ksub distance table is what a production scan
  // precomputes per query; here the codebooks are plan literals
  // (map lookups), the codes frame is the only corpus-sized input, and
  // ranking uses the bounded TopKOrdered aggregate — never a corpus-wide
  // per-query window sort.
  val q_pq_adc: QueryDef = QueryDef(
    s"""WITH $headSql,
       |q AS (SELECT vec_id AS query_id FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, e.vec_id,
       |    ${(0 until M).map(s =>
              s"(SELECT ${duckDist(s"eq$s.vs", "cbq.cv")} FROM es$s eq$s, cb$s cbq, cod$s cdq " +
              s"WHERE eq$s.vec_id = q.query_id AND cdq.vec_id = e.vec_id AND cbq.code = cdq.code)")
              .mkString("\n    + ")} AS adist
       |  FROM q, e WHERE q.query_id <> e.vec_id),
       |r AS (SELECT query_id, vec_id, adist,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, vec_id) AS INT) AS rnk
       |  FROM s)
       |SELECT query_id, vec_id, round(adist, 6) AS adist, rnk
       |FROM r WHERE rnk <= $TopK
       |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
    val idx = pqIndex(s, dir)
    val e = Similarity.embFrame(s, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // codebook lookup as a literal map per subspace: code -> centroid
    val books = idx.books.map(b =>
      map(b.flatMap { case (id, cv) => Seq(lit(id), typedlit(cv)) }: _*))
    val adist = (0 until M).map { sub =>
      distSq(subVec(col("qv"), sub), element_at(books(sub), col(s"c$sub")))
    }.reduce(_ + _)
    idx.codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), adist.as("adist"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("adist"), col("vec_id"), TopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t").getField("id").as("vec_id"),
        round(-col("t").getField("score"), 6).as("adist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // -- ADC shortlist + exact re-rank: the production read path --------------
  // Raw ADC order collapses inside a tight cluster: every member shares
  // the query's code tuple, so their ADC distances TIE exactly and the
  // id tiebreak — not geometry — picks the "top" 3 (measured recall@3
  // 0.13 on the 10-cluster corpus). The standard fix IS the production
  // design: the compressed scan produces a SHORTLIST (R=50 here, ~10% of
  // the corpus), and only shortlist members get their full-precision
  // vectors fetched for an exact re-rank — measured recall@3 0.73, at
  // full-vector I/O cost R/n of the exact scan. Both stages rank through
  // bounded TopKOrdered aggregates; the full-vector join touches R rows
  // per query, never the corpus.
  private val Shortlist = 50

  val q_pq_rerank: QueryDef = QueryDef(
    s"""WITH $headSql,
       |q AS (SELECT vec_id AS query_id FROM e WHERE vec_id < $NQueries),
       |s AS (SELECT q.query_id, e.vec_id,
       |    ${(0 until M).map(s =>
              s"(SELECT ${duckDist(s"eq$s.vs", "cbq.cv")} FROM es$s eq$s, cb$s cbq, cod$s cdq " +
              s"WHERE eq$s.vec_id = q.query_id AND cdq.vec_id = e.vec_id AND cbq.code = cdq.code)")
              .mkString("\n    + ")} AS adist
       |  FROM q, e WHERE q.query_id <> e.vec_id),
       |sh AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, vec_id) AS srk
       |  FROM s) WHERE srk <= $Shortlist),
       |x AS (SELECT sh.query_id, sh.vec_id,
       |    list_reduce(list_transform(range(1, $Dim + 1), i ->
       |      (CAST(eq.v[i] AS DOUBLE) - CAST(ev.v[i] AS DOUBLE))
       |      * (CAST(eq.v[i] AS DOUBLE) - CAST(ev.v[i] AS DOUBLE))), (a, b) -> a + b) AS d
       |  FROM sh JOIN e eq ON eq.vec_id = sh.query_id JOIN e ev ON ev.vec_id = sh.vec_id),
       |r AS (SELECT query_id, vec_id, d,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id) AS INT) AS rnk
       |  FROM x)
       |SELECT query_id, vec_id, round(d, 6) AS dist, rnk
       |FROM r WHERE rnk <= $TopK
       |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
    val idx = pqIndex(s, dir)
    val e = Similarity.embFrame(s, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val books = idx.books.map(b =>
      map(b.flatMap { case (id, cv) => Seq(lit(id), typedlit(cv)) }: _*))
    val adist = (0 until M).map { sub =>
      distSq(subVec(col("qv"), sub), element_at(books(sub), col(s"c$sub")))
    }.reduce(_ + _)
    val short = idx.codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), adist.as("adist"), col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(-col("adist"), col("vec_id"), Shortlist).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t").getField("id").as("vec_id"))
    val exact = aggregate(zip_with(col("qv"), col("v"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    short
      .join(e.select(col("vec_id"), col("v")), "vec_id")
      .join(broadcast(q), "query_id")
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
    "q_pq_codes" -> q_pq_codes,
    "q_pq_adc" -> q_pq_adc,
    "q_pq_rerank" -> q_pq_rerank)
}
