package graft.ext

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{NfcNormalize, StripAccents, UrlNormalize}
import graft.queries.QueryDef

/** Canonicalization operators — the two normalizations every crawl
  * pipeline runs before ANY equality-based operator (exact dedup,
  * shingle hashing, URL-level dedup, blocklist joins) can be trusted:
  *
  *   - [[graft.functions.UrlNormalize]]: RFC 3986 syntax-based URL
  *     normalization (case, default ports, percent-encoding,
  *     dot-segments, fragment) — without it, the same resource appears
  *     under many spellings and URL dedup/host statistics undercount.
  *   - [[graft.functions.NfcNormalize]] / [[graft.functions.StripAccents]]:
  *     Unicode NFC and accent folding — without NFC, precomposed and
  *     decomposed spellings of the same grapheme fracture exact-dup
  *     groups and token counts.
  *
  * All three are native codegen'd Catalyst expressions (registered in
  * SQL as `graft_url_normalize` / `graft_nfc` / `graft_strip_accents`),
  * so both queries here are single-scan whole-stage-codegen projections
  * — zero shuffles, embarrassingly parallel at any corpus size. The
  * oracles gate them cross-engine: the URL query against a closed-form
  * expected string (the input is synthesized with known quirks — mixed
  * case, default port, `%7e`/`%41`/`%2f` triplets, `..` and `.`
  * segments, a fragment), the Unicode query against DuckDB's own
  * independent `nfc_normalize` / `strip_accents` implementations
  * (utf8proc lineage vs the JDK's ICU lineage — agreement IS the test).
  */
object TextNorm {

  // ---- q_url_normalize -----------------------------------------------------------

  /** Synthesized messy URLs → native normalization → (normalized form,
    * host via Spark's own parse_url over OUR normalized output, path
    * depth). Expected values are closed-form in (doc_id, source).
    */
  val q_url_normalize: QueryDef = QueryDef(
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
      |    || '://www.' || source || '.example.com/a/c/~doc/'
      |    || CAST(doc_id AS VARCHAR) || repeat('/seg', CAST(doc_id % 3 AS INT))
      |    || '?q=A' || CAST(doc_id AS VARCHAR) || '&x=%2F' AS url_norm,
      |  'www.' || source || '.example.com' AS host,
      |  CAST(4 + doc_id % 3 AS BIGINT) AS depth
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = concat(
      when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("HTTPS://")),
      lit("WWW."), upper(col("source")), lit(".ExAmple.COM"),
      when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
      lit("/a/b/../c/./%7edoc/"), col("doc_id").cast("string"),
      repeat(lit("/seg"), (col("doc_id") % 3).cast("int")),
      lit("?q=%41"), col("doc_id").cast("string"), lit("&x=%2f"),
      lit("#frag"), col("doc_id").cast("string"))
    Tables.documents(s, dir)
      .select(col("doc_id"), UrlNormalize(raw).as("url_norm"))
      .select(col("doc_id"), col("url_norm"),
        parse_url(col("url_norm"), lit("HOST")).as("host"),
        (size(split(parse_url(col("url_norm"), lit("PATH")), "/")) - 1)
          .cast("long").as("depth"))
      .orderBy(col("doc_id"))
  }

  // ---- q_unicode_normalize --------------------------------------------------------

  /** Document text salted with decomposed sequences (combining diaeresis
    * + acute, plus a doc-dependent vowel) → native NFC + accent fold →
    * md5/length gates recomputed by DuckDB's independent utf8proc-based
    * implementations of the SAME Unicode algorithms.
    */
  val q_unicode_normalize: QueryDef = QueryDef(
    """WITH d AS (SELECT doc_id,
      |    text || ' Nai' || chr(776) || 've Cafe' || chr(769) || ' '
      |      || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'A' WHEN 1 THEN 'E'
      |         WHEN 2 THEN 'I' ELSE 'O' END || chr(769) AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  md5(nfc_normalize(raw)) AS nfc_md5,
      |  CAST(length(raw) AS BIGINT) AS n_raw,
      |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
      |  md5(strip_accents(raw)) AS stripped_md5
      |FROM d
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val vowel = element_at(
      array(lit("A"), lit("E"), lit("I"), lit("O")),
      (col("doc_id") % 4).cast("int") + 1)
    val raw = concat(col("text"), lit(" Nai\u0308ve Cafe\u0301 "),
      vowel, lit("\u0301"))
    Tables.documents(s, dir)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        md5(NfcNormalize(col("raw")).cast("binary")).as("nfc_md5"),
        length(col("raw")).cast("long").as("n_raw"),
        length(NfcNormalize(col("raw"))).cast("long").as("n_nfc"),
        md5(StripAccents(col("raw")).cast("binary")).as("stripped_md5"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_url_normalize" -> q_url_normalize,
    "q_unicode_normalize" -> q_unicode_normalize)
}
