package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Near-duplicate detection for LLM training corpora: MinHash signatures,
  * MinHash+LSH band-join candidate pairs, SimHash fingerprints, and char
  * n-gram Jaccard — the standard large-scale dedup toolkit.
  *
  * Scale design: signatures/fingerprints are pure per-row projections
  * (zero shuffle, whole-stage codegen). Pair generation shuffles only
  * (band_key → doc ids), i.e. O(corpus * bands) small rows — never the
  * O(n²) all-pairs space — and exact Jaccard verification touches only
  * the LSH candidates. All hashes share a bit-exact md5-hex contract with
  * the DuckDB oracle (see [[TextAnalysis.hash60]]).
  */
object Dedup {

  /** Number of signature components exposed by q_minhash_sig. */
  private val SigK = 8
  /** LSH parameters for q_minhash_lsh_pairs: Bands bands of R rows each
    * over a k = Bands*R signature. b=8, r=2 → catches ~90% of pairs at
    * J=0.5 and ~99.9% at J=0.8 while keeping false candidates rare.
    */
  private val Bands = 8
  private val R = 2

  /** Shared DuckDB fragment: distinct word 3-gram shingle sets. */
  private val shingleSql =
    """SELECT doc_id, list_distinct(
      |    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin

  private def duckMinhash(seed: Int): String =
    s"list_min(list_transform(sh, x -> CAST('0x' || substr(md5('$seed|' || x), 1, 15) AS BIGINT)))"

  /** Distinct word 3-gram shingle set (Spark side). */
  private def shingleSet: Column =
    array_distinct(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))

  // -- k-component MinHash signature, one scalar column per component -------
  val q_minhash_sig: QueryDef = QueryDef(
    s"""SELECT doc_id, ${(0 until SigK).map(k => duckMinhash(k) + s" AS mh$k").mkString(", ")}
       |FROM ($shingleSql)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id") +: shingleSet.as("sh") +: Nil: _*)
      .select(col("doc_id") +:
        (0 until SigK).map(k => TextAnalysis.minhash(col("sh"), k).as(s"mh$k")): _*)
      .orderBy(col("doc_id"))
  }

  // -- MinHash + LSH banding: candidate pairs + exact Jaccard verify --------
  // Pipeline: per-row k=16 signature → explode into 8 band keys (r=2) →
  // self-equi-join on (band, band_key) → DISTINCT candidate pairs → join
  // shingle sets back → integer Jaccard (inter, union counts — integers so
  // the oracle hash can never drift on float repr) → keep J >= 0.5.
  val q_minhash_lsh_pairs: QueryDef = QueryDef(
    s"""WITH d AS ($shingleSql),
       |sig AS (SELECT doc_id, sh,
       |  ${(0 until Bands * R).map(k => duckMinhash(k) + s" AS mh$k").mkString(", ")} FROM d),
       |bands AS (SELECT doc_id, b.band,
       |  CASE ${(0 until Bands).map(b => s"WHEN b.band = $b THEN mh${R * b} || '|' || mh${R * b + 1}").mkString(" ")} END AS bkey
       |  FROM sig, (SELECT unnest(range($Bands)) AS band) b),
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |    len(list_intersect(da.sh, db.sh)) AS inter,
       |    len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS uni
       |  FROM p JOIN d da ON p.doc_a = da.doc_id JOIN d db ON p.doc_b = db.doc_id)
       |SELECT doc_a, doc_b, inter, uni FROM j
       |WHERE inter * 2 >= uni
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), shingleSet.as("sh"))
    val sig = docs.select(col("doc_id") +: col("sh") +:
      (0 until Bands * R).map(k => TextAnalysis.minhash(col("sh"), k).as(s"mh$k")): _*)
    val bands = sig.select(col("doc_id"),
        explode(array((0 until Bands).map(b => struct(
          lit(b).as("band"),
          concat(col(s"mh${R * b}").cast("string"), lit("|"),
            col(s"mh${R * b + 1}").cast("string")).as("bkey"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // -- 16-bit SimHash fingerprint -------------------------------------------
  // Per token: 16-bit md5 hash; per bit: sum of +1/-1 over tokens; bit set
  // iff the sum is positive. Pure per-row arithmetic on both engines.
  val q_simhash: QueryDef = QueryDef(
    """SELECT doc_id, CAST(list_sum(list_transform(range(16), b ->
      |    CASE WHEN list_sum(list_transform(th, h ->
      |        CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |      THEN 1 << b ELSE 0 END)) AS BIGINT) AS simhash
      |FROM (SELECT doc_id, list_transform(string_split(text, ' '),
      |    t -> CAST('0x' || substr(md5(t), 1, 4) AS INT)) AS th
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val th = transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.hash16(t))
    Tables.documents(s, dir)
      .select(col("doc_id"), th.as("th"))
      .select(col("doc_id"),
        (0 until 16).map { b =>
          val vote = aggregate(col("th"), lit(0),
            (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
          when(vote > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
      .orderBy(col("doc_id"))
  }

  // -- char 3-gram Jaccard near-dup -----------------------------------------
  // Candidates: docs whose 4-component char-gram minhash signatures agree
  // EXACTLY (a single high-precision LSH band) — near-identical docs only,
  // complementing the recall-oriented word-shingle LSH above.
  val q_ngram_jaccard: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, list_distinct(
       |    CASE WHEN len(text) >= 3 THEN list_transform(range(1, len(text) - 1),
       |      i -> substr(text, CAST(i AS INT), 3))
       |    ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM documents),
       |k AS (SELECT doc_id, g,
       |  ${(0 until 4).map(s0 => s"list_min(list_transform(g, x -> CAST('0x' || substr(md5('${s0 + 100}|' || x), 1, 15) AS BIGINT)))").mkString(" || '|' || ")} AS bkey
       |  FROM d),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.g, b.g)) AS inter,
       |    len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
       |  FROM k a JOIN k b ON a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, inter, uni FROM p
       |WHERE inter * 2 >= uni
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.charNgrams(col("text"), 3).as("g"))
    // concat (not concat_ws): propagates NULL for an empty gram set,
    // matching the oracle's `||` semantics
    val keyed = grams.select(col("doc_id"), col("g"),
      (0 until 4).map(s0 => TextAnalysis.minhash(col("g"), s0 + 100).cast("string"))
        .reduce((a, b) => concat(a, lit("|"), b)).as("bkey"))
    keyed.as("a").join(keyed.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.g"), col("b.g"))).as("inter"),
        (size(col("a.g")) + size(col("b.g")) -
          size(array_intersect(col("a.g"), col("b.g")))).as("uni"))
      .filter(col("inter") * 2 >= col("uni"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_minhash_sig" -> q_minhash_sig,
    "q_minhash_lsh_pairs" -> q_minhash_lsh_pairs,
    "q_simhash" -> q_simhash,
    "q_ngram_jaccard" -> q_ngram_jaccard)
}
