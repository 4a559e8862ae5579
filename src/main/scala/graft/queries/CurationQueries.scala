package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.TextAnalysis

/** Second wave of curation/reporting operators: sessionization, equi-depth
  * binning, blocked fuzzy record linkage, co-purchase connected components,
  * and a rational (log-free) BM25 relevance scorer.
  *
  * Same cross-engine exactness rules as [[CoreQueries]]/[[AnalyticsQueries]]:
  * BIGINT arithmetic in hashed output, integral `div`, total-ordered LIMIT
  * boundaries, deterministic md5 where hashing is needed.
  */
object CurationQueries {

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  // -- D21: per-event sessionization ----------------------------------------
  // The event-level twin of q_session_window: assign every event its
  // user-local session ordinal (new session when >30 min elapsed since
  // the user's previous event), so downstream ops can join on
  // (user_id, session_seq) instead of re-deriving gaps. Classic two-pass
  // window: a lag() break flag, then a running sum of breaks — BOTH over
  // the same (user_id) partitioning, so Catalyst plans ONE exchange and
  // sorts once. Scale: parallelism is user-cardinality (q_key_skew is
  // the pre-flight for a hot user); nothing global.
  val q_sessionize: QueryDef = QueryDef(
    """WITH x AS (SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |b AS (SELECT event_id, user_id, sec,
      |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
      |SELECT event_id, user_id,
      |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS BIGINT)
      |    AS session_seq
      |FROM b ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), expr("CAST(ts AS LONG)").as("sec"))
      .withColumn("brk",
        when(lag(col("sec"), 1).over(w).isNull
          || col("sec") - lag(col("sec"), 1).over(w) > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(w))
      .select(col("event_id"), col("user_id"), col("session_seq"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // -- D29: metadata-vs-content language mismatch audit ----------------------
  // The catalog-trust check: per (source, declared lang), how many docs
  // the stopword-ratio detector (H13's q_lang_id heuristic) DISAGREES
  // with, in ppm — a source whose declared metadata diverges from its
  // content is mislabeled upstream and silently poisons every lang-
  // filtered mixture built from the catalog column. One corpus scan
  // (per-row HOF detector, no explode), one (source, lang)-cardinality
  // rollup.
  val q_lang_mismatch: QueryDef = QueryDef(
    s"""SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN predicted <> lang THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_mismatch,
       |  CAST(sum(CASE WHEN predicted <> lang THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS mismatch_ppm
       |FROM (
       |  SELECT source, lang,
       |    CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) * 5
       |           >= len(string_split(text, ' '))
       |         THEN 'en' ELSE 'other' END AS predicted
       |  FROM documents) t
       |GROUP BY source, lang ORDER BY source, lang""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        when(TextAnalysis.stopwordCount(toks) * 5 >= size(toks), "en")
          .otherwise("other").as("predicted"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted") =!= col("lang"), 1L).otherwise(0L))
          .as("n_mismatch"))
      .withColumn("mismatch_ppm", expr("n_mismatch * 1000000 div n_docs"))
      .orderBy(col("source"), col("lang"))
  }

  // -- D30: corpus growth report ---------------------------------------------
  // The capacity-planning curve: events per (type, week) with the week-
  // over-week delta in ppm — the input to "when does this topic outgrow
  // its partition budget". The corpus collapses to a (type, week) frame
  // in one aggregate; the lag() window runs over that calendar-bounded
  // frame (weeks x types, never corpus rows), partitioned by type.
  val q_growth_report: QueryDef = QueryDef(
    """WITH w AS (SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, wk * 604800 AS week_epoch, CAST(n AS BIGINT) AS n_events,
      |  CAST(COALESCE((n - lag(n) OVER (PARTITION BY event_type ORDER BY wk))
      |    * 1000000 // lag(n) OVER (PARTITION BY event_type ORDER BY wk), 0)
      |    AS BIGINT) AS wow_delta_ppm
      |FROM w ORDER BY event_type, week_epoch""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) div 604800").as("wk"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wow_delta_ppm",
        coalesce(expr("(n - lag(n) OVER (PARTITION BY event_type ORDER BY wk)) " +
          "* 1000000 div lag(n) OVER (PARTITION BY event_type ORDER BY wk)"),
          lit(0L)))
      .select(col("event_type"), (col("wk") * 604800).as("week_epoch"),
        col("n").as("n_events"), col("wow_delta_ppm"))
      .orderBy(col("event_type"), col("week_epoch"))
  }

  // -- D24: source freshness / completeness report --------------------------
  // The ingestion-health dashboard row: per event type, row count, first/
  // last event epoch, and lag behind the globally freshest type — the
  // first thing an on-call looks at when a pipeline "looks stale". One
  // type-cardinality aggregate + one broadcast scalar; integral seconds
  // end-to-end.
  val q_freshness: QueryDef = QueryDef(
    """WITH s AS (SELECT event_type, count(*) AS n_events,
      |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_sec,
      |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec
      |  FROM events GROUP BY event_type),
      |g AS (SELECT max(last_sec) AS tip FROM s)
      |SELECT event_type, n_events, first_sec, last_sec,
      |  g.tip - last_sec AS lag_secs
      |FROM s CROSS JOIN g ORDER BY event_type""".stripMargin) { (s, dir) =>
    val st = Tables.events(s, dir)
      .select(col("event_type"), expr("CAST(ts AS LONG)").as("sec"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), min(col("sec")).as("first_sec"),
        max(col("sec")).as("last_sec"))
    val tip = st.agg(max(col("last_sec")).as("tip"))
    st.crossJoin(broadcast(tip))
      .select(col("event_type"), col("n_events"), col("first_sec"), col("last_sec"),
        (col("tip") - col("last_sec")).as("lag_secs"))
      .orderBy(col("event_type"))
  }

  // -- D23: session statistics ----------------------------------------------
  // The aggregate layer over D21: one row per (user, session) with event
  // count, bounds, and duration — the frame engagement metrics join
  // against. The two windows AND the final groupBy all key on user_id,
  // so Catalyst plans ONE exchange for the whole query; the session
  // rollup rides the sessionize windows' sort for free.
  val q_session_stats: QueryDef = QueryDef(
    """WITH x AS (SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |b AS (SELECT event_id, user_id, sec,
      |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |s AS (SELECT event_id, user_id, sec,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS BIGINT)
      |      AS session_seq
      |  FROM b)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(sec) AS start_sec, max(sec) AS end_sec,
      |  max(sec) - min(sec) AS duration_secs
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), expr("CAST(ts AS LONG)").as("sec"))
      .withColumn("brk",
        when(lag(col("sec"), 1).over(w).isNull
          || col("sec") - lag(col("sec"), 1).over(w) > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        (max(col("sec")) - min(col("sec"))).as("duration_secs"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  // -- D22: equi-depth quantile bins ----------------------------------------
  // The feature-discretization table: per event_type, quartile boundaries
  // by NTILE (equal row counts per bin) with each bin's exact [lo, hi]
  // value range and population. The emitted 4-row-per-type table is what
  // a training pipeline BROADCASTS to bin the full corpus — computing it
  // is one window over (event_type)-partitioned data. Scale: per-group
  // windows parallelize by type-cardinality; for the single-huge-group
  // shape use the histogram-narrowing path (temporal/Selection.scala, the
  // q_percentiles_dist plan) instead of any sort. Ties broken by
  // event_id, so the NTILE assignment is total-ordered on both engines.
  val q_quantile_bins: QueryDef = QueryDef(
    """WITH b AS (SELECT event_type, value, ntile(4) OVER
      |    (PARTITION BY event_type ORDER BY value, event_id) AS bin FROM events)
      |SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n_events,
      |  min(value) AS lo, max(value) AS hi
      |FROM b GROUP BY event_type, bin ORDER BY event_type, bin""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("bin", ntile(4).over(w).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_events"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy(col("event_type"), col("bin"))
  }

  // -- B10: schema-flexible JSON via VariantType ----------------------------
  // The schema-on-read complement to B3's fixed-schema from_json: Spark
  // 4's VARIANT parses once into a binary semi-structured value and
  // extracts fields by path WITHOUT declaring the full schema up front —
  // the right decode when producers add props keys faster than consumers
  // re-deploy schemas (from_json silently nulls unknown shapes; variant
  // keeps them queryable). parse_json + variant_get stay codegen'd
  // columnar ops; the aggregate is an ordinary hash agg per event type.
  val q_variant_props: QueryDef = QueryDef(
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  max(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("k", variant_get(parse_json(col("props")), "$.k", "bigint"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  // -- C17: blocked fuzzy record linkage ------------------------------------
  // Entity resolution the way it survives 100 TB: NEVER all-pairs. Names
  // dedup to name-cardinality first, a deterministic blocking key (last
  // token) partitions the candidate space, pairs form only WITHIN a
  // block, and the edit-distance gate runs on that bounded candidate set.
  // Catalyst plans the self-join as a hash join on the block key; fan-out
  // is max-block-size bounded (q_key_skew on the block column is the
  // pre-flight). The pattern is Dedup.lshJaccardPairs with (block key,
  // levenshtein) in place of (band key, Jaccard).
  val q_entity_match: QueryDef = QueryDef(
    """WITH n AS (SELECT p_name, count(*) AS n_rows FROM part GROUP BY p_name),
      |b AS (SELECT p_name, n_rows, string_split(p_name, ' ')[-1] AS blk FROM n)
      |SELECT x.p_name AS name_a, y.p_name AS name_b, x.blk AS block_key,
      |  CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS edit_dist,
      |  x.n_rows AS rows_a, y.n_rows AS rows_b
      |FROM b x JOIN b y ON x.blk = y.blk AND x.p_name < y.p_name
      |WHERE levenshtein(x.p_name, y.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    val n = Tables.part(s, dir).groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_rows"))
    val b = n.withColumn("blk", element_at(split(col("p_name"), " "), -1))
    b.as("x").join(b.as("y"),
        col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
      .withColumn("edit_dist",
        levenshtein(col("x.p_name"), col("y.p_name")).cast("long"))
      .filter(col("edit_dist") <= 3)
      .select(col("x.p_name").as("name_a"), col("y.p_name").as("name_b"),
        col("x.blk").as("block_key"), col("edit_dist"),
        col("x.n_rows").as("rows_a"), col("y.n_rows").as("rows_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  // -- C18: connected components of the co-purchase graph -------------------
  // The general-graph face of the dedup cluster collapse: same
  // [[graft.ext.Components]] min-label propagation (one equi-join + one
  // aggregation per round, O(1) convergence check, lineage truncated per
  // round), here over the co-purchase item graph instead of near-dup
  // pairs. Oracle: recursive reachability CTE — a different algorithm
  // arriving at the same fixpoint.
  val q_graph_cc: QueryDef = QueryDef(
    s"""${CoreQueries.coPurchaseCtes.replace("WITH ", "WITH RECURSIVE ")},
       |u AS (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
       |r AS (SELECT src AS id, dst AS m FROM u
       |  UNION SELECT r.id, u.dst FROM r JOIN u ON r.m = u.src)
       |SELECT id AS part, least(id, min(m)) AS component_id
       |FROM r GROUP BY id ORDER BY part""".stripMargin) { (s, dir) =>
    graft.ext.Components
      .connectedComponents(CoreQueries.coPurchaseEdges(s, dir), "a", "b")
      .select(col("id").as("part"), col("cluster_id").as("component_id"))
      .orderBy(col("part"))
  }

  // -- C19: label-propagation communities -----------------------------------
  // The community-detection layer between q_graph_cc (components = the
  // coarsest communities) and q_kcore (cohesion cores): synchronous
  // plurality-label propagation, FIXED 3 rounds (sync LP can oscillate,
  // so a fixed-round fold IS the deterministic contract — see
  // GraphAnalytics.labelPropagation). Oracle: the 3 rounds unrolled as
  // chained CTEs with a row_number argmax — count-desc then label-asc,
  // exactly the lexicographic max(struct(cnt, -lbl)) the Spark side
  // aggregates (no window on corpus-scale data in the Spark plan).
  val q_label_prop: QueryDef = QueryDef {
    val rounds = (1 to 3).map { i =>
      s"""l$i AS (SELECT v, lbl FROM (
         |    SELECT s.dst AS v, l.lbl, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY s.dst
         |        ORDER BY count(*) DESC, l.lbl ASC) AS rk
         |    FROM sym s JOIN l${i - 1} l ON l.v = s.src
         |    GROUP BY s.dst, l.lbl) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""${CoreQueries.coPurchaseCtes},
       |sym AS (SELECT a AS src, b AS dst FROM e
       |  UNION ALL SELECT b AS src, a AS dst FROM e),
       |l0 AS (SELECT src AS v, src AS lbl FROM sym GROUP BY src),
       |$rounds
       |SELECT v AS part, lbl AS community FROM l3 ORDER BY part""".stripMargin
  } { (s, dir) =>
    graft.graph.GraphAnalytics
      .labelPropagation(CoreQueries.coPurchaseEdges(s, dir), iters = 3)
      .orderBy(col("part"))
  }

  // -- H37: rational BM25 relevance scoring ---------------------------------
  // Retrieval-style relevance of every document against a deterministic
  // query-term set (df-ranked terms 5-8 — past the boilerplate head,
  // still corpus-frequent enough to hit many docs). BM25's tf saturation
  // (k1=1.2) and length normalization (b=0.75) are computed EXACTLY in
  // integers: with A = avgdl = sum_dl div n_docs,
  //   tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/A))
  //           = 44*tf*A   / (20*tf*A + 6*A + 18*dl)      (x20/x20)
  // emitted in ppm; the idf log is replaced by its (monotone) argument
  // (2(N-df)+1)*1e6 div (2df+1) — per-term rank-equivalent to BM25's idf
  // and hash-gateable where a cross-engine float ln never is (documented
  // delta: the SUM weights high-idf terms more than log-BM25 would).
  // Scale shape: the q-term set broadcasts (4 rows), the tf join keys on
  // term, the dl join on doc_id rides the tf aggregate's own exchange,
  // and the top-20 is TakeOrdered with a doc_id tiebreak — no global
  // sort, one corpus tokenize pass shared via the persisted tf frame.
  val q_bm25_rational: QueryDef = QueryDef(
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |t AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term <> '' GROUP BY doc_id, term),
      |d AS (SELECT term, count(*) AS df FROM t GROUP BY term),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM t GROUP BY doc_id),
      |g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
      |             (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
      |qt AS (SELECT term, df FROM (SELECT term, df,
      |    row_number() OVER (ORDER BY df DESC, term) AS rnk FROM d)
      |  WHERE rnk BETWEEN 5 AND 8)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
      |  CAST(sum(((2 * (g.n_docs - qt.df) + 1) * 1000000 // (2 * qt.df + 1))
      |    * ((44 * t.tf * (g.sum_dl // g.n_docs)) * 1000000
      |       // (20 * t.tf * (g.sum_dl // g.n_docs)
      |          + 6 * (g.sum_dl // g.n_docs) + 18 * dl.dl))
      |    // 1000000) AS BIGINT) AS score_ppm
      |FROM t JOIN qt USING (term) JOIN dl USING (doc_id) CROSS JOIN g
      |GROUP BY t.doc_id
      |ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // tf off the shared materialized token frame (see
    // TextAnalysis.corpusTokens); the tf aggregate itself is persisted
    // because it feeds three downstream roll-ups (df, dl, score join)
    val t = TextAnalysis.corpusTokens(s, dir)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t.count() // eager barrier — see Dedup.lshJaccardPairs
    val d = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = t.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // df ranks 5-8 without a global window (PlanInvariantSpec): two
    // TakeOrdered heads over the vocab-sized frame, anti-joined
    val top8 = d.orderBy(col("df").desc, col("term")).limit(8)
    val top4 = d.orderBy(col("df").desc, col("term")).limit(4)
    val qt = top8.join(top4.select("term"), Seq("term"), "left_anti")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val sumDl = dl.agg(sum(col("dl")).as("sum_dl"))
    t.join(broadcast(qt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(sumDl))
      .withColumn("contrib", expr(
        """((2 * (n_docs - df) + 1) * 1000000 div (2 * df + 1))
          | * ((44 * tf * (sum_dl div n_docs)) * 1000000
          |    div (20 * tf * (sum_dl div n_docs)
          |         + 6 * (sum_dl div n_docs) + 18 * dl))
          | div 1000000""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(20)
  }

  val all: Map[String, QueryDef] = Map(
    "q_lang_mismatch" -> q_lang_mismatch,
    "q_growth_report" -> q_growth_report,
    "q_sessionize" -> q_sessionize,
    "q_session_stats" -> q_session_stats,
    "q_variant_props" -> q_variant_props,
    "q_freshness" -> q_freshness,
    "q_quantile_bins" -> q_quantile_bins,
    "q_entity_match" -> q_entity_match,
    "q_graph_cc" -> q_graph_cc,
    "q_label_prop" -> q_label_prop,
    "q_bm25_rational" -> q_bm25_rational)
}
