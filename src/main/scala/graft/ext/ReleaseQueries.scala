package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Release-preparation operators — the last-mile ops a 100 TB curation run
  * executes between "dedup pairs exist" and "dataset ships": segment-level
  * dedup with document reassembly, incremental (new-docs-only) near-dup
  * discovery, BPE merge-candidate counting, the benchmark-x-source
  * contamination matrix, a dedup-cluster cohesion audit, and the per-source
  * dataset card.
  *
  * Same cross-engine exactness rules as [[ExtQueries]]: BIGINT arithmetic
  * in hashed output, integral `div`, md5-derived determinism, total-ordered
  * LIMIT boundaries. No scalar UDFs, no corpus-scale global windows, no
  * all-pairs joins (every pair space is LSH-band- or hash-bucketed).
  */
object ReleaseQueries {

  private val SegTokens = 12

  // -- H45: segment-level dedup with reassembly -----------------------------
  // CCNet-style paragraph dedup (Wenzek et al. 2020 dedupe by paragraph
  // hash; here "paragraph" = 12-token segment, the corpus has no newline
  // structure): a segment survives only in its FIRST corpus occurrence
  // (min (doc_id, seg_idx)); every document is rebuilt from its surviving
  // segments. Catches cross-document boilerplate that doc-level near-dup
  // never drops (J(doc_a, doc_b) stays tiny when only one paragraph is
  // shared) and, unlike q_repeated_spans (which REPORTS duplicated spans),
  // actually EMITS the cleaned corpus.
  //
  // Scale shape: segments explode once (corpus token count rows across
  // all segments); first-occurrence election is a groupBy(h).min(key) +
  // equi-join back on the 60-bit segment hash — NOT a window MIN: the
  // aggregate's partial (map-side) combine collapses a mega-duplicated
  // segment to one row per map task before the exchange, and the join
  // back is AQE-skew-splittable, where a window partitioned by h would
  // pin ALL copies of a viral segment (think: the empty-boilerplate
  // paragraph repeated 10⁹ times at 100 TB) onto ONE task with no
  // splitting mechanism. Big-frame exchanges: segs by h (join), segs by
  // doc_id (reassembly) — the keeper frame's own exchange moves
  // map-task-collapsed rows only. The keeper key packs (doc_id, seg_idx)
  // into one BIGINT (seg_idx < 100000 = docs up to 1.2M tokens) so the
  // election is a single-column MIN on both engines.
  val q_paragraph_dedup: QueryDef = QueryDef(
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |seg AS (SELECT doc_id,
       |    unnest(range(0, CAST((len(toks) + ${SegTokens - 1}) // $SegTokens AS BIGINT)))
       |      AS seg_idx, toks
       |  FROM t),
       |sh AS (SELECT doc_id, seg_idx,
       |    array_to_string(toks[seg_idx*$SegTokens+1 : (seg_idx+1)*$SegTokens], ' ') AS seg_text,
       |    CAST('0x' || substr(md5(
       |      array_to_string(toks[seg_idx*$SegTokens+1 : (seg_idx+1)*$SegTokens], ' ')
       |    ), 1, 15) AS BIGINT) AS h
       |  FROM seg),
       |k AS (SELECT doc_id, seg_idx, seg_text,
       |    (doc_id*100000 + seg_idx) = min(doc_id*100000 + seg_idx) OVER (PARTITION BY h)
       |      AS kept
       |  FROM sh)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  coalesce(string_agg(CASE WHEN kept THEN seg_text END, ' ' ORDER BY seg_idx), '')
       |    AS new_text
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val segs = Tables.documents(s, dir)
      .repartition(col("doc_id")) // spread the md5 projection — see Dedup.wordShingleDocs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"sequence(CAST(0 AS BIGINT), CAST((size(toks) + ${SegTokens - 1}) DIV $SegTokens - 1 AS BIGINT))"))
          .as("seg_idx"))
      .withColumn("seg_text",
        concat_ws(" ", slice(col("toks"), (col("seg_idx") * SegTokens + 1).cast("int"), lit(SegTokens))))
      .withColumn("h", graft.functions.Md5PrefixLong(col("seg_text"), 15))
    val keyCol = col("doc_id") * 100000L + col("seg_idx")
    val keeper = segs.groupBy(col("h")).agg(min(keyCol).as("keeper_key"))
    segs
      .join(keeper, "h")
      .withColumn("kept", keyCol === col("keeper_key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"), struct(col("seg_idx"), col("seg_text"))))),
          x => x.getField("seg_text"))).as("new_text"))
      .orderBy(col("doc_id"))
  }

  // -- H46: incremental near-dup discovery (the daily-crawl path) -----------
  // A 100 TB corpus is not re-deduped from scratch per crawl: the new
  // increment (here doc_id % 10 = 0, ~10% of the corpus) hashes ONCE, its
  // band rows join against the accumulated band index (old UNION new), and
  // only candidate pairs TOUCHING a new doc are verified — O(new x bucket)
  // work per increment instead of O(corpus²) re-runs. This is the batch
  // twin of StreamDedup's per-microbatch fold, declared as a query so the
  // oracle pins the exactly-equal contract: incremental pairs == the full
  // run's pairs filtered to new-touching (an LSH candidate (a,b) shares a
  // band bucket, so any pair with a new side is found by the new-side
  // band join — no recall loss from incrementality).
  val q_dedup_incremental: QueryDef = QueryDef(
    s"""WITH ${Dedup.duckLshJaccardCtes(Dedup.wordShingleSql, bands = 8, r = 2)}
       |SELECT doc_a, doc_b, inter, uni FROM jv
       |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    val sh = Dedup.corpusShingles(s, dir)
    val band = Dedup.bandRowsOf(sh, bands = 8, r = 2)
    val bandNew = band.filter(col("doc_id") % 10 === 0)
    val cand = bandNew.as("a").join(band.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    Dedup.verifyJaccard(cand, sh)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // -- H47: BPE merge-candidate counting (tokenizer training, step 1) -------
  // The first iteration of byte-pair encoding (Sennrich et al. 2016): count
  // adjacent symbol pairs over the word-frequency table and rank merge
  // candidates. The corpus collapses to its VOCABULARY first (one token
  // explode + word-cardinality aggregate) and the per-position pair
  // explode runs over vocab-sized data weighted by word counts — at
  // 100 TB the pair counting is vocabulary-work, not corpus-work, which
  // is exactly why production BPE trainers operate on word-count tables.
  // Top-30 = TakeOrdered with a pair tiebreak, no global sort.
  /** Word-frequency table (w, cnt) — the corpus collapsed to its
    * vocabulary; shared front half of the BPE pair/apply queries.
    */
  private def wordFreqs(s: org.apache.spark.sql.SparkSession, dir: String) =
    // shared materialized token frame (see TextAnalysis.corpusTokens)
    TextAnalysis.corpusTokens(s, dir)
      .select(col("term").as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Adjacent char-pair frequencies over the word-frequency table
    * (vocab-work, not corpus-work), unordered.
    */
  private def bpePairFreqs(s: org.apache.spark.sql.SparkSession, dir: String) =
    wordFreqs(s, dir).select(col("cnt"), explode(
        when(length(col("w")) >= 2,
          transform(sequence(lit(1), length(col("w")) - 1),
            i => concat(col("w").substr(i, lit(1)), lit(" "), col("w").substr(i + 1, lit(1)))))
          .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))

  private val duckBpeCtes =
    """tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok
      |  WHERE w <> '' GROUP BY w),
      |p AS (SELECT cnt,
      |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS pair
      |  FROM wf),
      |pf AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS freq FROM p GROUP BY pair)""".stripMargin

  val q_bpe_pairs: QueryDef = QueryDef(
    s"""WITH $duckBpeCtes
       |SELECT pair, freq FROM pf ORDER BY freq DESC, pair LIMIT 30""".stripMargin) { (s, dir) =>
    bpePairFreqs(s, dir)
      .orderBy(col("freq").desc, col("pair"))
      .limit(30)
  }

  // -- H56: BPE merge application (tokenizer training, step 2) --------------
  // Apply the top-R ranked merges to the vocabulary and report each
  // word's resulting pieces — the segmentation the trained tokenizer
  // would emit after R merge steps, next to the per-word occurrence
  // count that weights its corpus-wide token cost. EXACT BPE semantics
  // per rule via sentinel-delimited single-pass replace: each token is
  // wrapped `|tok|` and a merge `x y` rewrites `|x| |y|` -> `|xy|` —
  // the sentinels make cross-token false matches impossible (`|lo| |w|`
  // never matches `|o| |w|`), and one left-to-right non-overlapping
  // replace pass IS the fixpoint (replacing `x y` with `xy` can never
  // create a new `x`-`y` adjacency), identically on both engines.
  // Scale shape: everything runs on the VOCABULARY (the corpus collapsed
  // first, the production BPE-trainer layout); the R merge rules are a
  // bounded driver collect (R rows — the kthSmallest precedent) landing
  // in the plan as literals. Deliberate one-shot variant: the R merges
  // come from ONE pair count (a full trainer recounts pairs after each
  // merge — that is R sequential count-rank-apply rounds of this exact
  // plan, driver-looped like ancestorsClosure's rounds).
  private val BpeMerges = 3

  /** The oracle's per-word merge replay + piece projection: CTEs `m`
    * (ranked merges), `spaced` (sentinel-wrapped chars), `ap` (merges
    * applied), `pieces` (w, cnt, pieces, n_pieces) — appended after
    * [[duckBpeCtes]]; shared by q_bpe_apply and q_bpe_encode.
    */
  private def duckPiecesCtes: String = {
    val applied = (1 to BpeMerges).foldLeft("s0") { (acc, r) =>
      s"""replace($acc,
         |  '|' || string_split((SELECT pair FROM m WHERE rk = $r), ' ')[1] ||
         |    '| |' || string_split((SELECT pair FROM m WHERE rk = $r), ' ')[2] || '|',
         |  '|' || replace((SELECT pair FROM m WHERE rk = $r), ' ', '') || '|')""".stripMargin
    }
    s"""m AS (SELECT pair, row_number() OVER (ORDER BY freq DESC, pair) AS rk
       |  FROM pf QUALIFY rk <= $BpeMerges),
       |spaced AS (SELECT w, cnt,
       |    '|' || array_to_string(list_transform(range(1, len(w)+1), i -> w[i]), '| |') || '|'
       |      AS s0
       |  FROM wf),
       |ap AS (SELECT w, cnt, $applied AS sn FROM spaced),
       |pieces AS (SELECT w, cnt, replace(replace(sn, '| |', ' '), '|', '') AS pieces,
       |  CAST(len(string_split(replace(replace(sn, '| |', ' '), '|', ''), ' ')) AS BIGINT)
       |    AS n_pieces
       |FROM ap)""".stripMargin
  }

  /** The trained merge list: BpeMerges rows to the driver, by design.
    * A PARTIALLY short merge list (0 < pairs < rules) would NULL-poison
    * the oracle's rank-r scalar subqueries against live vocab rows —
    * fail loudly. A fully EMPTY corpus is fine: pad with sentinel rules
    * that can never match; both engines emit zero vocab rows, so the
    * padded rules are never applied.
    */
  private def bpeRules(s: org.apache.spark.sql.SparkSession, dir: String): Seq[String] = {
    val merges = bpePairFreqs(s, dir)
      .orderBy(col("freq").desc, col("pair")).limit(BpeMerges)
      .collect().map(_.getString(0)).toSeq
    require(merges.isEmpty || merges.size == BpeMerges,
      s"corpus has ${merges.size} distinct char pairs < $BpeMerges merge rules")
    if (merges.nonEmpty) merges
    else (1 to BpeMerges).map(r => s"\u0001$r \u0001$r")
  }

  /** The vocabulary segmented under the trained merges:
    * (w, cnt, pieces, n_pieces) — q_bpe_apply's body, shared with the
    * corpus-encode pass.
    */
  private def bpeVocabPieces(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val spaced = concat(lit("|"),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), "| |"),
      lit("|"))
    val applied = bpeRules(s, dir).foldLeft(spaced) { (c, m) =>
      val Array(x, y) = m.split(' ')
      // merge strings come from corpus tokens; the sentinel rewrite uses
      // literal (non-regex) replace on both engines
      call_function("replace", c, lit(s"|$x| |$y|"), lit(s"|$x$y|"))
    }
    wordFreqs(s, dir)
      .withColumn("pieces",
        call_function("replace",
          call_function("replace", applied, lit("| |"), lit(" ")),
          lit("|"), lit("")))
      .withColumn("n_pieces", size(split(col("pieces"), " ")).cast("long"))
      .select(col("w"), col("cnt"), col("pieces"), col("n_pieces"))
  }

  val q_bpe_apply: QueryDef = QueryDef(
    s"""WITH $duckBpeCtes,
       |$duckPiecesCtes
       |SELECT w, cnt, pieces, n_pieces FROM pieces ORDER BY w""".stripMargin) {
    (s, dir) => bpeVocabPieces(s, dir).orderBy(col("w"))
  }

  // -- H82: BPE corpus encode (tokenizer training, step 3) -------------------
  // q_bpe_pairs trains, q_bpe_apply segments the VOCABULARY; this encodes
  // the CORPUS under the trained merge table — the exact token count
  // every mixing/packing decision (H17b, H24) otherwise approximates
  // with whitespace tokens, plus an order-sensitive 60-bit checksum of
  // the encoded piece sequence (piece string + token position), which
  // pins the exact segmentation at every position — token ids derive
  // bijectively from piece strings, so hashing pieces IS hashing ids.
  //
  // Scale shape: the merge replay runs once per VOCABULARY word (the
  // corpus collapsed first — production BPE-encoder layout), then the
  // corpus pass is one broadcast hash join of the token frame against
  // the segmented vocab (vocab is MB-scale at any corpus size) and one
  // per-doc aggregation; zero corpus-side shuffles beyond the groupBy.
  val q_bpe_encode: QueryDef = QueryDef(
    s"""WITH $duckBpeCtes,
       |$duckPiecesCtes,
       |t0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |t AS (SELECT doc_id, w, CAST(pos - 1 AS BIGINT) AS pos FROM t0
       |  WHERE w <> '')
       |SELECT t.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(p.n_pieces) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST('0x' || substr(md5('13|' || p.pieces || '|' ||
       |      CAST(t.pos AS VARCHAR)), 1, 15) AS BIGINT) % 1000000007)
       |    % 1000000007 AS BIGINT) AS h
       |FROM t JOIN pieces p ON t.w = p.w
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val vocab = bpeVocabPieces(s, dir).select(col("w"), col("pieces"), col("n_pieces"))
    TextAnalysis.corpusTokens(s, dir)
      .join(broadcast(vocab), col("term") === col("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        (sum(TextAnalysis.hash60(
          concat_ws("|", col("pieces"), col("pos")), 13) % 1000000007L)
          % 1000000007L).as("h"))
      .orderBy(col("doc_id"))
  }

  // -- H49: benchmark-suite x corpus-source contamination matrix ------------
  // q_decontaminate answers "which docs are contaminated"; this answers the
  // release-review question "which SOURCE leaks which BENCHMARK" — the
  // matrix that decides whether a source is dropped wholesale or
  // spot-cleaned. Two deterministic synthetic suites (doc_id % 97 / % 89)
  // stand in for held-out benchmarks; suite members are excluded from
  // their own corpus side so hits measure leakage, not identity.
  //
  // Scale shape: benchmark shingle sets are MB-scale at any corpus size
  // (suites are fixed-size) -> broadcast; the corpus's shingle explode
  // reuses the SHARED materialized shingle table; only hit rows (contamination-
  // scale) reach the doc join and the (suite, source) rollup.
  val q_contamination_matrix: QueryDef = QueryDef(
    s"""WITH d AS (${Dedup.wordShingleSql}),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM d),
       |bench AS (SELECT DISTINCT suite, h FROM (
       |  SELECT 'suiteA' AS suite, h FROM ex WHERE doc_id % 97 = 0
       |  UNION ALL SELECT 'suiteB', h FROM ex WHERE doc_id % 89 = 0)),
       |hits AS (SELECT b.suite, e.doc_id, count(*) AS n
       |  FROM ex e JOIN bench b ON e.h = b.h
       |  WHERE NOT (b.suite = 'suiteA' AND e.doc_id % 97 = 0)
       |    AND NOT (b.suite = 'suiteB' AND e.doc_id % 89 = 0)
       |  GROUP BY b.suite, e.doc_id)
       |SELECT suite, source, CAST(count(*) AS BIGINT) AS n_docs_hit,
       |  CAST(sum(n) AS BIGINT) AS n_shingle_hits
       |FROM hits JOIN documents USING (doc_id)
       |GROUP BY suite, source ORDER BY suite, source""".stripMargin) { (s, dir) =>
    val ex = Dedup.corpusShingles(s, dir)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val bench = ex.filter(col("doc_id") % 97 === 0)
      .select(lit("suiteA").as("suite"), col("h"))
      .unionAll(ex.filter(col("doc_id") % 89 === 0)
        .select(lit("suiteB").as("suite"), col("h")))
      .distinct()
    val hits = ex.join(broadcast(bench), "h")
      .filter(!(col("suite") === "suiteA" && col("doc_id") % 97 === 0)
        && !(col("suite") === "suiteB" && col("doc_id") % 89 === 0))
      .groupBy(col("suite"), col("doc_id")).agg(count(lit(1)).as("n"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(broadcast(hits), "doc_id")
      .groupBy(col("suite"), col("source"))
      .agg(count(lit(1)).as("n_docs_hit"), sum(col("n")).as("n_shingle_hits"))
      .orderBy(col("suite"), col("source"))
  }

  // -- H52: dedup-cluster cohesion audit ------------------------------------
  // The QA gate on the cluster collapse: per near-dup cluster, member
  // count, verified-pair count, and min/avg/max pairwise Jaccard (ppm).
  // A cluster whose min_j_ppm sits at the 500000 threshold while n_pairs
  // << n_docs*(n_docs-1)/2 is a CHAIN (a~b~c with a!~c) — transitive
  // over-collapse that silently deletes non-duplicates; this report is
  // how a curation run catches it before shipping. Everything past the
  // shared materialized pair frame is contamination-scale: the component
  // frame broadcasts into the pair join, aggregates are cluster-cardinality.
  val q_cluster_audit: QueryDef = QueryDef(
    s"""WITH RECURSIVE ${Dedup.duckLshJaccardCtes(Dedup.wordShingleSql, bands = 8, r = 2)},
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM jv
       |  UNION SELECT doc_b, doc_a FROM jv),
       |r AS (SELECT src AS id, dst AS m FROM e
       |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.m = e.src),
       |c AS (SELECT id, least(id, min(m)) AS cluster_id FROM r GROUP BY id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs FROM c GROUP BY cluster_id),
       |pj AS (SELECT c.cluster_id, inter * 1000000 // uni AS j_ppm
       |  FROM jv JOIN c ON jv.doc_a = c.id),
       |a AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(min(j_ppm) AS BIGINT) AS min_j_ppm,
       |    CAST(max(j_ppm) AS BIGINT) AS max_j_ppm,
       |    CAST(sum(j_ppm) // count(*) AS BIGINT) AS avg_j_ppm
       |  FROM pj GROUP BY cluster_id)
       |SELECT cluster_id, n_docs, n_pairs, min_j_ppm, max_j_ppm, avg_j_ppm
       |FROM a JOIN sz USING (cluster_id) ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val pairs = Dedup.corpusLshPairs(s, dir, bands = 8, r = 2)
    val comp = Components
      .connectedComponents(pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    val sizes = comp.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(comp.select(col("id").as("doc_a"), col("cluster_id"))), "doc_a")
      .withColumn("j_ppm", expr("CAST(inter AS BIGINT) * 1000000 div uni"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("j_ppm")).as("min_j_ppm"), max(col("j_ppm")).as("max_j_ppm"),
        expr("sum(j_ppm) div count(1)").as("avg_j_ppm"))
      .join(broadcast(sizes), "cluster_id")
      .select(col("cluster_id"), col("n_docs"), col("n_pairs"),
        col("min_j_ppm"), col("max_j_ppm"), col("avg_j_ppm"))
      .orderBy(col("cluster_id"))
  }

  // -- H51: per-source dataset card -----------------------------------------
  // The release artifact published next to a corpus drop (Gebru et al.
  // 2021 datasheets): one row per source with volume (docs/tokens/chars),
  // language spread (distinct langs + plurality lang), exact-duplicate
  // exposure, and token density. One corpus scan feeds the volume
  // aggregate; the plurality lang is a window over source-cardinality
  // groups (bounded partitions, never corpus-wide); exact-dup counts ride
  // a window partitioned by the text hash (the q_dedup_exact shuffle);
  // the final assembly joins source-cardinality frames (broadcast).
  val q_dataset_card: QueryDef = QueryDef(
    """WITH tl AS (SELECT source, lang, count(*) AS cnt FROM documents
      |  GROUP BY source, lang),
      |top AS (SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rk
      |    FROM tl) WHERE rk = 1),
      |th AS (SELECT doc_id, source,
      |    count(*) OVER (PARTITION BY md5(text)) AS n_same FROM documents),
      |dup AS (SELECT source,
      |    CAST(sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_dup_docs
      |  FROM th GROUP BY source),
      |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents GROUP BY source)
      |SELECT b.source, n_docs, n_tokens, total_chars, n_langs, top_lang, exact_dup_docs,
      |  n_tokens * 1000000 // n_docs AS tokens_per_doc_ppm
      |FROM base b JOIN top USING (source) JOIN dup USING (source)
      |ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"))
    val tl = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
    val top = tl
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    // exact-dup exposure via groupBy + join back (NOT a window over the
    // text hash): map-side combine collapses mass-duplicated texts before
    // the exchange and the join is AQE-skew-splittable — the same
    // viral-boilerplate argument as q_paragraph_dedup's keeper election
    val docTh = docs
      .repartition(col("doc_id")) // spread the md5 projection over the single input split
      .select(col("source"), md5(col("text")).as("th"))
    val thCounts = docTh.groupBy(col("th")).agg(count(lit(1)).as("n_same"))
    val dup = docTh.join(thCounts, "th")
      .groupBy(col("source"))
      .agg(sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("exact_dup_docs"))
    base.join(broadcast(top), "source").join(broadcast(dup), "source")
      .withColumn("tokens_per_doc_ppm", expr("n_tokens * 1000000 div n_docs"))
      .orderBy(col("source"))
  }

  // -- H53: quality-bucketed mixture (CCNet head/middle/tail) ---------------
  // The composition step after perplexity scoring (Wenzek et al. 2020):
  // split the corpus into score tertiles — head (most fluent), middle,
  // tail — and downsample each bucket at its own rate (100% / 50% / 10%),
  // with a pure-md5 keep decision (reproducible, growth-stable for
  // surviving docs, zero RNG). Composes H31's bigram LM score with H19b's
  // distributed exact selection: the tertile thresholds come from
  // [[graft.temporal.Selection.kthSmallest]] — O(levels) scans, driver
  // memory O(buckets), NO global sort — and land in the plan as two
  // literals, so bucketing is a per-row projection on one scan of the
  // scored frame. The oracle recomputes the identical thresholds by
  // exact rank, so a drift in the selection path FAILS the hash gate.
  val q_quality_mix: QueryDef = QueryDef(
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |big AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks) x),
      |c12 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS n1 FROM big GROUP BY 1),
      |sc AS (SELECT doc_id,
      |    CAST(CAST(sum(n12 * 1000000 // n1) AS BIGINT) // count(*) AS BIGINT) AS lm_score
      |  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY doc_id),
      |g AS (SELECT count(*) AS n FROM sc),
      |rk AS (SELECT lm_score AS v, row_number() OVER (ORDER BY lm_score) AS rn FROM sc),
      |t1 AS (SELECT v FROM rk, g WHERE rn = greatest(n // 3, 1)),
      |t2 AS (SELECT v FROM rk, g WHERE rn = greatest(2 * n // 3, 1)),
      |b AS (SELECT doc_id,
      |    CASE WHEN lm_score >= (SELECT v FROM t2) THEN 'head'
      |         WHEN lm_score >= (SELECT v FROM t1) THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM sc),
      |k AS (SELECT doc_id, bucket,
      |    CASE bucket WHEN 'head' THEN 100 WHEN 'middle' THEN 50 ELSE 10 END AS rate,
      |    CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
      |      AS r
      |  FROM b)
      |SELECT bucket, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN r < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(coalesce(sum(CASE WHEN r < rate
      |    THEN len(string_split(text, ' ')) END), 0) AS BIGINT) AS kept_tokens
      |FROM k JOIN documents USING (doc_id)
      |GROUP BY bucket, source ORDER BY bucket, source""".stripMargin) { (s, dir) =>
    val sc = ExtQueries.lmScores(s, dir).select(col("doc_id"), col("lm_score"))
    // tertile thresholds WITHOUT a global sort: recursive histogram
    // narrowing; two longs reach the driver, by design (Selection.scala)
    val (nScored, tertiles) = graft.temporal.Selection.kthSmallestBy(
      sc, "lm_score", n => Seq(math.max(n / 3, 1L), math.max(2 * n / 3, 1L)))
    // empty corpus: no tertile exists; 0/0 placeholders are never applied
    // to a row, and the report correctly emits zero rows
    val Seq(t1, t2) = if (nScored == 0) Seq(0L, 0L) else tertiles
    val out = sc
      .withColumn("bucket",
        when(col("lm_score") >= t2, "head")
          .when(col("lm_score") >= t1, "middle")
          .otherwise("tail"))
      .withColumn("rate",
        when(col("bucket") === "head", 100L)
          .when(col("bucket") === "middle", 50L).otherwise(10L))
      .withColumn("r",
        graft.functions.Md5PrefixLong(
          concat(lit("mix|"), col("doc_id").cast("string")), 15) % 100)
      .join(Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).as("n_toks")), "doc_id")
      .groupBy(col("bucket"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("r") < col("rate"), 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("r") < col("rate"), col("n_toks"))), lit(0L))
          .cast("long").as("kept_tokens"))
      .orderBy(col("bucket"), col("source"))
    out
  }

  // -- H54: near-dup breakdown by source pair -------------------------------
  // The diagnosis layer between pair emission (H3) and the source-overlap
  // shingle matrix (H26): verified near-dup PAIRS attributed to source
  // pairs — (s, s) rows are internal duplication (crawler re-fetch,
  // mirror paths), (s, t) rows are cross-source scraping; the two have
  // different fixes (dedup within ingest vs drop/trace the copying
  // source), which is why the release review wants them separated.
  // Scale shape: the verified pair frame is contamination-scale ->
  // broadcast into two doc_id-keyed joins against single corpus scans
  // (the corpus is never shuffled); the rollup output is <= n_sources².
  val q_dup_breakdown: QueryDef = QueryDef(
    s"""WITH ${Dedup.duckLshJaccardCtes(Dedup.wordShingleSql, bands = 8, r = 2)},
       |sa AS (SELECT inter, uni, da.source AS s_a, db.source AS s_b
       |  FROM jv JOIN documents da ON jv.doc_a = da.doc_id
       |          JOIN documents db ON jv.doc_b = db.doc_id)
       |SELECT least(s_a, s_b) AS source_a, greatest(s_a, s_b) AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(inter * 1000000 // uni) // count(*) AS BIGINT) AS avg_j_ppm
       |FROM sa GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val pairs = Dedup.corpusLshPairs(s, dir, bands = 8, r = 2)
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val p1 = src.join(broadcast(pairs), src("doc_id") === pairs("doc_a"))
      .select(col("doc_b"), col("inter"), col("uni"), col("source").as("s_a"))
    val p2 = src.join(broadcast(p1), src("doc_id") === p1("doc_b"))
      .select(col("s_a"), col("source").as("s_b"), col("inter"), col("uni"))
    p2.select(least(col("s_a"), col("s_b")).as("source_a"),
        greatest(col("s_a"), col("s_b")).as("source_b"),
        col("inter"), col("uni"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(CAST(inter AS BIGINT) * 1000000 div uni) div count(1)").as("avg_j_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // -- H55: out-of-vocabulary rate by source --------------------------------
  // Tokenizer-health metric: per source, the fraction of token
  // occurrences outside the corpus-trained top-V vocabulary (V=16 here —
  // half this synthetic corpus's 31-token vocabulary, so the signal is
  // non-trivial; production uses the tokenizer's real V, same plan). A
  // source whose OOV rate spikes fragments into byte-fallback tokens,
  // inflating its effective token cost and degrading training — this is
  // the pre-flight that catches it. Scale shape: one token explode, a
  // vocabulary-scale frequency aggregate, the top-V head via TakeOrdered
  // (vocab-sized, broadcast), one left join on the token, one
  // source-cardinality rollup.
  val q_oov_rate: QueryDef = QueryDef(
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |t AS (SELECT source, w FROM tok WHERE w <> ''),
      |tf AS (SELECT w, count(*) AS cnt FROM t GROUP BY w),
      |v AS (SELECT w, 1 AS inv FROM tf ORDER BY cnt DESC, w LIMIT 16)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(sum(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) * 1000000 // count(*)
      |    AS BIGINT) AS oov_ppm
      |FROM t LEFT JOIN v USING (w)
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    // shared materialized token frame — one tokenize per corpus version
    // however many text queries run (see TextAnalysis.corpusTokens)
    val t = TextAnalysis.corpusTokens(s, dir)
      .select(col("source"), col("term").as("w"))
    val vocab = t.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(16)
      .select(col("w"), lit(1).as("inv"))
    t.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .orderBy(col("source"))
  }

  // -- H62: train/test split leakage through near-dup clusters ---------------
  // The evaluation-integrity gate the split alone can't give: a doc and
  // its near-duplicate landing on OPPOSITE sides of the train/test split
  // leaks test content into training even after H20's exact-overlap
  // decontamination. Verified near-dup pairs (the shared LSH frame)
  // joined to the SAME md5 split assignment as q_train_test_split,
  // rolled up by (split, split) cell — any off-diagonal row is leakage;
  // the fix is cluster-aware splitting (assign whole dedup components,
  // H15, to one side). Scale shape = q_dup_breakdown's: the pair frame
  // is contamination-scale and broadcasts into two doc_id-keyed joins
  // against corpus scans; rollup is 3x3.
  val q_split_leakage: QueryDef = QueryDef(
    s"""WITH ${Dedup.duckLshJaccardCtes(Dedup.wordShingleSql, bands = 8, r = 2)},
       |sp AS (SELECT doc_id, CASE WHEN sk < 900 THEN 'train'
       |    WHEN sk < 950 THEN 'valid' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |      CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)
       |        AS BIGINT) % 1000 AS sk FROM documents)),
       |pa AS (SELECT inter, uni, sa.split AS sp_a, sb.split AS sp_b
       |  FROM jv JOIN sp sa ON jv.doc_a = sa.doc_id
       |          JOIN sp sb ON jv.doc_b = sb.doc_id)
       |SELECT least(sp_a, sp_b) AS split_a, greatest(sp_a, sp_b) AS split_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(inter * 1000000 // uni) // count(*) AS BIGINT) AS avg_j_ppm
       |FROM pa GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val pairs = Dedup.corpusLshPairs(s, dir, bands = 8, r = 2)
    val sp = Tables.documents(s, dir)
      .withColumn("sk",
        graft.functions.Md5PrefixLong(
          concat(lit("split|"), col("doc_id").cast("string")), 15) % 1000)
      .select(col("doc_id"),
        when(col("sk") < 900, "train").when(col("sk") < 950, "valid")
          .otherwise("test").as("split"))
    val p1 = sp.join(broadcast(pairs), sp("doc_id") === pairs("doc_a"))
      .select(col("doc_b"), col("inter"), col("uni"), col("split").as("sp_a"))
    val p2 = sp.join(broadcast(p1), sp("doc_id") === p1("doc_b"))
      .select(col("sp_a"), col("split").as("sp_b"), col("inter"), col("uni"))
    p2.select(least(col("sp_a"), col("sp_b")).as("split_a"),
        greatest(col("sp_a"), col("sp_b")).as("split_b"),
        col("inter"), col("uni"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(CAST(inter AS BIGINT) * 1000000 div uni) div count(1)").as("avg_j_ppm"))
      .orderBy(col("split_a"), col("split_b"))
  }

  // -- D28: k-anonymity release gate -----------------------------------------
  // The privacy review a dataset release runs over its event exhaust:
  // users grouped by quasi-identifier (event type x value band x week) —
  // any group with < k distinct users is re-identifiable and must be
  // suppressed or generalized before release. Per event type: group
  // counts, under-k groups, rows they'd suppress, suppression ppm.
  // Scale shape: corpus -> quasi-id groups in one two-phase aggregate
  // (the distinct-user count is the usual partial-distinct expand), then
  // a type-cardinality rollup; nothing after the first aggregate is
  // corpus-scale.
  val q_k_anonymity: QueryDef = QueryDef(
    """WITH q AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) // 2000 AS vband,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk, user_id
      |  FROM events),
      |g AS (SELECT event_type, vband, wk,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |    CAST(count(*) AS BIGINT) AS n_rows
      |  FROM q GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_small_groups,
      |  CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) AS BIGINT)
      |    AS suppressed_rows,
      |  CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) * 1000000
      |    // sum(n_rows) AS BIGINT) AS suppression_ppm
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val g = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) div 2000").as("vband"),
        expr("CAST(ts AS LONG) div 604800").as("wk"), col("user_id"))
      .groupBy(col("event_type"), col("vband"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_rows"))
    g.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_users") < 5, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("n_users") < 5, col("n_rows")).otherwise(0L))
          .as("suppressed_rows"),
        sum(col("n_rows")).as("total_rows"))
      .withColumn("suppression_ppm",
        expr("suppressed_rows * 1000000 div total_rows"))
      .drop("total_rows")
      .orderBy(col("event_type"))
  }

  // -- H63: Kneser-Ney count export (LM training, the smoothing inputs) ------
  // The count tables a KN-smoothed n-gram LM trains from, exported
  // exactly: per term, its left-position unigram count, its continuation
  // count |{w' : c(w', w) > 0}| (the KN numerator — how many DISTINCT
  // contexts precede it, the quantity that demotes "Francisco"-style
  // words frequent only after one context), and its right diversity
  // |{w' : c(w, w') > 0}|. One bounded bigram explode, one distinct, three
  // vocab-sized aggregates left-joined onto the term universe — every
  // output integral, no probability floats (the smoothed model divides
  // these at query time).
  val q_kn_counts: QueryDef = QueryDef(
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |big AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks) x),
      |d AS (SELECT DISTINCT w1, w2 FROM big),
      |terms AS (SELECT DISTINCT term FROM (
      |    SELECT w1 AS term FROM big UNION ALL SELECT w2 FROM big)),
      |uni AS (SELECT w1 AS term, CAST(count(*) AS BIGINT) AS c_left
      |  FROM big GROUP BY 1),
      |pred AS (SELECT w2 AS term, CAST(count(*) AS BIGINT) AS n_pred
      |  FROM d GROUP BY 1),
      |succ AS (SELECT w1 AS term, CAST(count(*) AS BIGINT) AS n_succ
      |  FROM d GROUP BY 1)
      |SELECT term, COALESCE(uni.c_left, 0) AS c_left,
      |  COALESCE(pred.n_pred, 0) AS n_pred,
      |  COALESCE(succ.n_succ, 0) AS n_succ
      |FROM terms LEFT JOIN uni USING (term) LEFT JOIN pred USING (term)
      |  LEFT JOIN succ USING (term)
      |ORDER BY term""".stripMargin) { (s, dir) =>
    val big = Tables.documents(s, dir)
      .repartition(col("doc_id")) // spread the explode — see Dedup.wordShingleDocs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2) // sequence(1, size-1) would descend below 2
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val d = big.distinct()
    val terms = big.select(col("w1").as("term"))
      .unionAll(big.select(col("w2").as("term"))).distinct()
    val uni = big.groupBy(col("w1").as("term")).agg(count(lit(1)).as("c_left"))
    val pred = d.groupBy(col("w2").as("term")).agg(count(lit(1)).as("n_pred"))
    val succ = d.groupBy(col("w1").as("term")).agg(count(lit(1)).as("n_succ"))
    terms.join(uni, Seq("term"), "left").join(pred, Seq("term"), "left")
      .join(succ, Seq("term"), "left")
      .na.fill(0L, Seq("c_left", "n_pred", "n_succ"))
      .orderBy(col("term"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_split_leakage" -> q_split_leakage,
    "q_k_anonymity" -> q_k_anonymity,
    "q_kn_counts" -> q_kn_counts,
    "q_quality_mix" -> q_quality_mix,
    "q_dup_breakdown" -> q_dup_breakdown,
    "q_oov_rate" -> q_oov_rate,
    "q_bpe_apply" -> q_bpe_apply,
    "q_bpe_encode" -> q_bpe_encode,
    "q_paragraph_dedup" -> q_paragraph_dedup,
    "q_dedup_incremental" -> q_dedup_incremental,
    "q_bpe_pairs" -> q_bpe_pairs,
    "q_contamination_matrix" -> q_contamination_matrix,
    "q_cluster_audit" -> q_cluster_audit,
    "q_dataset_card" -> q_dataset_card)
}
