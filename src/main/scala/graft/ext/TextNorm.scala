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

  /** Mojibake detection + repair — the ftfy-style fix for the most
    * common corpus corruption: UTF-8 bytes decoded as Latin-1 somewhere
    * upstream ("café" shipped as "cafÃ©"). The heuristic is the
    * standard one: a string is repairable iff (a) every char is in the
    * Latin-1 range, (b) reading its chars AS bytes yields valid UTF-8,
    * and (c) that reading contains at least one multibyte sequence
    * (strictly shorter result). ASCII passes through untouched and a
    * genuine "café" is NOT mangled (its 0xE9 byte reading is invalid
    * UTF-8) — the discriminator that makes the fix safe to run blind
    * over a corpus.
    *
    * Implementation is ALL native expressions — `rlike` range gate,
    * `encode`/`decode`, `is_valid_utf8` (Spark 4), conditional via
    * `when` so the strict Spark 4 charset errors can never fire —
    * zero UDFs, whole-stage codegen end to end, embarrassingly
    * parallel: the 100 TB scale story is "it's a projection".
    *
    * The query augments the (all-ASCII) corpus with Latin-1 accents
    * closed-form, corrupts every third document by the real double-
    * encoding, then detects + repairs; the oracle recomputes the
    * augmented text directly — the repaired md5 must land back on it
    * exactly.
    */
  val q_mojibake_repair: QueryDef = QueryDef(
    s"""WITH a AS (SELECT doc_id,
       |    replace(replace(text, 'a', 'ä'), 'e', 'é') AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS was_corrupted,
       |  CAST(CASE WHEN doc_id % 3 = 0 AND octet_length(encode(aug)) > length(aug)
       |    THEN 1 ELSE 0 END AS BIGINT) AS moji_detected,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN octet_length(encode(aug))
       |    ELSE length(aug) END AS BIGINT) AS n_wire_chars,
       |  md5(aug) AS repaired_md5
       |FROM a ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val wire = when(col("doc_id") % 3 === 0,
      decode(encode(col("aug"), "UTF-8"), "ISO-8859-1")).otherwise(col("aug"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("replace(replace(text, 'a', 'ä'), 'e', 'é')").as("aug"))
      .withColumn("wire", wire)
      // (a) Latin-1 range gate — also guards the strict Spark 4 encode
      .withColumn("latin1able", col("wire").rlike("^[\\u0000-\\u00FF]*$"))
      .withColumn("bytes1", when(col("latin1able"), encode(col("wire"), "ISO-8859-1")))
      // (b) the byte reading must be valid UTF-8
      .withColumn("valid", col("latin1able") && is_valid_utf8(col("bytes1")))
      .withColumn("cand", when(col("valid"), decode(col("bytes1"), "UTF-8")))
      // (c) and strictly shorter — i.e. at least one multibyte sequence
      .withColumn("detected",
        coalesce(col("valid") && length(col("cand")) < length(col("wire")), lit(false)))
      .withColumn("repaired", when(col("detected"), col("cand")).otherwise(col("wire")))
      .select(col("doc_id"),
        (col("doc_id") % 3 === 0).cast("long").as("was_corrupted"),
        col("detected").cast("long").as("moji_detected"),
        length(col("wire")).cast("long").as("n_wire_chars"),
        md5(col("repaired").cast("binary")).as("repaired_md5"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_url_normalize" -> q_url_normalize,
    "q_unicode_normalize" -> q_unicode_normalize,
    "q_mojibake_repair" -> q_mojibake_repair)
}
