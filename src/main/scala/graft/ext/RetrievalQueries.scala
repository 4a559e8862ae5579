package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Hybrid-retrieval operators: reciprocal-rank fusion of a lexical and a
  * vector ranker, and the inverted-index build behind the lexical side.
  * `embeddings.vec_id` and `documents.doc_id` share the same id space in
  * the testdata (both 0..N-1), which is exactly the production layout — a
  * corpus with one embedding row per document — so the fused ranker reads
  * vec_id AS doc_id.
  *
  * Cross-engine exactness: both rankers produce INTEGER scores (shared-
  * term counts; int8-quantized dot products — see q_similarity_topk_q8's
  * contract), so every rank, and therefore every RRF sum, is engine-
  * independent with (score DESC, id ASC) tie ordering.
  */
object RetrievalQueries {

  private val Dim = 64
  private val NQueries = 5L
  private val Shortlist = 20
  private val FusedOut = 10
  private val RrfK = 60

  /** DuckDB fragment: q8-quantized embedding list (unit-normalize, round
    * to int8 lattice) — identical to q_similarity_topk_q8's.
    */
  private val duckQ8 =
    s"""e AS (SELECT vec_id, embedding AS v,
       |    sqrt(list_reduce(list_transform(range(1, $Dim + 1),
       |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
       |      (x, y) -> x + y)) AS nrm
       |  FROM embeddings),
       |q8 AS (SELECT vec_id, list_transform(range(1, $Dim + 1),
       |    i -> CAST(round(CAST(v[i] AS DOUBLE) / nrm * 127) AS BIGINT)) AS qv
       |  FROM e)""".stripMargin

  private def q8Frame(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("v"),
        sqrt(graft.functions.DotProduct(col("embedding"), col("embedding"))).as("nrm"))
    e.select(col("vec_id"),
      transform(col("v"), x => round(x.cast("double") / col("nrm") * 127).cast("long"))
        .as("qv"))
  }

  // -- H60: hybrid retrieval via reciprocal-rank fusion ----------------------
  // The RAG-serving capstone: each query document is ranked against the
  // corpus by a LEXICAL ranker (shared distinct-term count against the
  // query's term set) and a VECTOR ranker (int8-quantized dot product),
  // each ranker emits its top-20 shortlist, and the shortlists fuse by
  // RRF: Σ 1e6 div (60 + rank). Scale contract: RRF only ever touches
  // SHORTLISTS — the vector side is a one-pass TopKOrdered aggregate
  // (never a corpus sort), the lexical side joins the corpus term frame
  // against a BROADCAST query-term set, and the fusion join + final
  // window see ≤ 2·20·NQueries rows. A ranker built on float scores
  // could not hash-gate; both of these are integral.
  val q_rrf_fusion: QueryDef = QueryDef(
    s"""WITH $duckQ8,
       |qv AS (SELECT vec_id AS query_id, qv AS qq FROM q8
       |  WHERE vec_id < $NQueries),
       |vs AS (SELECT query_id, q8.vec_id AS doc_id,
       |    list_reduce(list_transform(range(1, $Dim + 1), i -> qq[i] * qv[i]),
       |      (x, y) -> x + y) AS d
       |  FROM qv, q8 WHERE query_id <> q8.vec_id),
       |vr AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY d DESC, doc_id) AS BIGINT) AS rnk_vec
       |  FROM vs QUALIFY rnk_vec <= $Shortlist),
       |t AS (SELECT DISTINCT doc_id, term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents) WHERE term <> ''),
       |qt AS (SELECT doc_id AS query_id, term FROM t WHERE doc_id < $NQueries),
       |ls AS (SELECT qt.query_id, t.doc_id, CAST(count(*) AS BIGINT) AS shared
       |  FROM t JOIN qt USING (term) WHERE t.doc_id <> qt.query_id
       |  GROUP BY 1, 2),
       |lr AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY shared DESC, doc_id) AS BIGINT) AS rnk_lex
       |  FROM ls QUALIFY rnk_lex <= $Shortlist),
       |f AS (SELECT COALESCE(lr.query_id, vr.query_id) AS query_id,
       |    COALESCE(lr.doc_id, vr.doc_id) AS doc_id,
       |    CAST(COALESCE(lr.rnk_lex, 0) AS BIGINT) AS rnk_lex,
       |    CAST(COALESCE(vr.rnk_vec, 0) AS BIGINT) AS rnk_vec,
       |    CAST(COALESCE(1000000 // ($RrfK + lr.rnk_lex), 0)
       |      + COALESCE(1000000 // ($RrfK + vr.rnk_vec), 0) AS BIGINT) AS rrf_ppm
       |  FROM lr FULL JOIN vr
       |    ON lr.query_id = vr.query_id AND lr.doc_id = vr.doc_id)
       |SELECT query_id, doc_id, rnk_lex, rnk_vec, rrf_ppm,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS rnk
       |FROM f QUALIFY rnk <= $FusedOut
       |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
    // vector shortlist: one-pass bounded top-k aggregate over the corpus
    val q8 = q8Frame(s, dir)
    val qv = q8.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"))
    val vr = q8.crossJoin(broadcast(qv))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"),
        graft.functions.IntDot(col("qq"), col("qv")).cast("double").as("d"),
        col("vec_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(col("d"), col("vec_id"), Shortlist).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t").getField("id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rnk_vec"))
    // lexical shortlist: the shared materialized incidence frame vs the
    // broadcast query-term set (see TextAnalysis.corpusDocTerms)
    val t = TextAnalysis.corpusDocTerms(s, dir)
    val qt = t.filter(col("doc_id") < NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val lr = t.join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("shared"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKOrdered(col("shared"), col("doc_id"), Shortlist).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t").getField("id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rnk_lex"))
    // fuse the two shortlists — ≤ 2·20·NQueries rows end to end
    lr.join(vr, Seq("query_id", "doc_id"), "full_outer")
      .na.fill(0L, Seq("rnk_lex", "rnk_vec"))
      .withColumn("rrf_ppm",
        (when(col("rnk_lex") > 0, expr(s"1000000 div ($RrfK + rnk_lex)")).otherwise(0L)
          + when(col("rnk_vec") > 0, expr(s"1000000 div ($RrfK + rnk_vec)")).otherwise(0L))
          .cast("long"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_ppm").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= FusedOut)
      .select(col("query_id"), col("doc_id"), col("rnk_lex"), col("rnk_vec"),
        col("rrf_ppm"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // -- H61: inverted-index build (posting-list heads) ------------------------
  // The serving-side artifact behind every lexical retriever: per term,
  // document frequency plus the head of its sorted posting list. The
  // head is a BOUNDED one-pass aggregate (TopKOrdered keeps the 20
  // smallest doc ids per term map-side — a groupBy window would pin a
  // viral stop-word's whole posting list onto one task), so no task ever
  // materializes an unbounded list; df counts ride the same aggregate.
  val q_inverted_index: QueryDef = QueryDef(
    """WITH t AS (SELECT DISTINCT doc_id, term FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents) WHERE term <> '')
      |SELECT term, CAST(count(*) AS BIGINT) AS df,
      |  array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',')
      |    AS postings_head
      |FROM t GROUP BY term
      |ORDER BY term""".stripMargin) { (s, dir) =>
    val t = TextAnalysis.corpusDocTerms(s, dir)
    t.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        // TopKOrdered keeps (score DESC, id ASC): negate the id to keep
        // the SMALLEST 20 doc ids, then read the ids back in ascending
        // order — a bounded buffer per term, never the full posting list
        graft.functions.TopKOrdered((-col("doc_id")).cast("double"),
          col("doc_id"), 20).as("top"))
      .select(col("term"), col("df"),
        array_join(transform(col("top"), e => e.getField("id")), ",")
          .as("postings_head"))
      .orderBy(col("term"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_rrf_fusion" -> q_rrf_fusion,
    "q_inverted_index" -> q_inverted_index)
}
