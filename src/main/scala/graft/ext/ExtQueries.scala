package graft.ext

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Extension operator queries (SURVEY.md §7.5): dedup, text analysis,
  * similarity, multimodal plumbing — the LLM-training-data pipeline surface.
  */
object ExtQueries {

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  // -- exact dedup: hash-groupBy --------------------------------------------
  val q_dedup_exact: QueryDef = QueryDef(
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY text_hash ORDER BY text_hash""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_hash"))
  }

  // -- token counting: whitespace + regex tokenizer -------------------------
  val q_token_count: QueryDef = QueryDef(
    s"""SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '${TextAnalysis.TokenRegex}')) AS n_re_tokens
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_ws_tokens"),
        size(TextAnalysis.regexTokens(col("text"))).as("n_re_tokens"))
      .orderBy(col("doc_id"))
  }

  // -- quality scoring: integer metrics + integer-compare bucket ------------
  val q_quality_score: QueryDef = QueryDef(
    s"""SELECT doc_id, n_chars, n_tokens, n_stop,
       |  CASE WHEN n_stop * 10 >= n_tokens THEN 'high'
       |       WHEN n_stop * 20 >= n_tokens THEN 'mid'
       |       ELSE 'low' END AS quality
       |FROM (
       |  SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS n_stop
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        size(toks).as("n_tokens"),
        TextAnalysis.stopwordCount(toks).as("n_stop"))
      .withColumn("quality",
        when(col("n_stop") * 10 >= col("n_tokens"), "high")
          .when(col("n_stop") * 20 >= col("n_tokens"), "mid")
          .otherwise("low"))
      .orderBy(col("doc_id"))
  }

  // -- language-ID heuristic: stopword-hit ratio ----------------------------
  val q_lang_id: QueryDef = QueryDef(
    s"""SELECT lang, predicted, count(*) AS cnt FROM (
       |  SELECT lang,
       |    CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) * 5
       |           >= len(string_split(text, ' '))
       |         THEN 'en' ELSE 'other' END AS predicted
       |  FROM documents) t
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("lang"),
        when(TextAnalysis.stopwordCount(toks) * 5 >= size(toks), "en")
          .otherwise("other").as("predicted"))
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("predicted"))
  }

  // -- document fingerprint: min-hash of word 5-gram shingles ---------------
  // Per-row expressions only — the round-1 explode+groupBy shape shuffled
  // 5-10x the corpus to recompute a value each row already owns; this form
  // is a single codegen'd projection with zero shuffle. Docs with <5 tokens
  // keep a row (null fingerprint, 0 shingles) rather than vanishing.
  val q_doc_fingerprint: QueryDef = QueryDef(
    """SELECT doc_id,
      |  list_min(list_transform(sh, s -> md5(s))) AS fingerprint,
      |  len(list_distinct(sh)) AS n_shingles
      |FROM (
      |  SELECT doc_id,
      |    CASE WHEN len(w) >= 5 THEN list_transform(range(1, len(w) - 3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])
      |    ELSE CAST([] AS VARCHAR[]) END AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x) t
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sh = TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 5)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_min(transform(sh, s => md5(s))).as("fingerprint"),
        size(array_distinct(sh)).as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  // -- multimodal/binary plumbing: opaque bytes + typed metadata ------------
  val q_binary_meta: QueryDef = QueryDef(
    """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS content_md5, sha256(text) AS content_sha256
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("content_md5"),
        sha2(col("text"), 256).as("content_sha256"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_dedup_exact" -> q_dedup_exact,
    "q_token_count" -> q_token_count,
    "q_quality_score" -> q_quality_score,
    "q_lang_id" -> q_lang_id,
    "q_doc_fingerprint" -> q_doc_fingerprint,
    "q_binary_meta" -> q_binary_meta) ++
    Dedup.all ++ Similarity.all ++ Multimodal.all
}
