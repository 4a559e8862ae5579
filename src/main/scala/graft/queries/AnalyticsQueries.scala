package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.TextAnalysis

/** Product-analytics and dataset-curation operators over the event stream
  * and document corpus — the reporting layer a training-data pipeline runs
  * on top of the hygiene ops in [[graft.ext.ExtQueries]].
  *
  * Everything here follows the engine's cross-engine exactness rules
  * (CoreQueries header): BIGINT arithmetic only in hashed output, integral
  * `div` instead of float division, deterministic md5 keep-decisions
  * instead of RNG sampling.
  */
object AnalyticsQueries {

  // -- D16: cohort retention matrix ------------------------------------------
  // The canonical activation report: users grouped by first-seen week
  // (cohort), counted in every later week they return. Scale shape: the
  // corpus collapses FIRST to distinct (user, week) pairs — everything
  // after operates on user-cardinality data, never raw events. The
  // cohort join is user-keyed on both sides; the distinct and the min-
  // aggregate share one exchange on user_id, so Catalyst plans a single
  // shuffle for both plus one for the final (cohort, offset) rollup.
  val q_retention_cohorts: QueryDef = QueryDef(
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
      |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
      |SELECT cw * 604800 AS cohort_epoch, wk - cw AS week_offset,
      |  count(*) AS n_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY cohort_epoch, week_offset
      |ORDER BY cohort_epoch, week_offset""".stripMargin) { (s, dir) =>
    val uw = Tables.events(s, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 604800").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min("wk").as("cw"))
    uw.join(cohort, "user_id")
      .groupBy((col("cw") * 604800).as("cohort_epoch"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_epoch"), col("week_offset"))
  }

  // -- D17: weekly churn -----------------------------------------------------
  // Users active in week w with no activity in week w+1, next to the
  // week's active total. The churn set is an anti-join of the (user,
  // week) frame against itself shifted one week — user-keyed, co-
  // partitioned with the frame's own exchange; no events-sized data moves
  // past the first distinct. The last observed week is excluded (its
  // "next week" hasn't happened), via one broadcast scalar.
  val q_churn_weekly: QueryDef = QueryDef(
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
      |a AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk),
      |c AS (SELECT u.wk, count(*) AS n_churned FROM uw u
      |  WHERE NOT EXISTS (SELECT 1 FROM uw v
      |    WHERE v.user_id = u.user_id AND v.wk = u.wk + 1)
      |  GROUP BY u.wk)
      |SELECT a.wk * 604800 AS week_epoch, a.n_active,
      |  CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
      |FROM a LEFT JOIN c ON a.wk = c.wk
      |WHERE a.wk < (SELECT max(wk) FROM uw)
      |ORDER BY week_epoch""".stripMargin) { (s, dir) =>
    val uw = Tables.events(s, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 604800").as("wk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    uw.count() // eager barrier — see Dedup.lshJaccardPairs
    val nextActive = uw.select(col("user_id"), (col("wk") - 1).as("wk"))
    val churned = uw.join(nextActive, Seq("user_id", "wk"), "left_anti")
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    val active = uw.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
    val maxWk = uw.agg(max("wk").as("max_wk"))
    active.join(churned, Seq("wk"), "left")
      .na.fill(0L, Seq("n_churned"))
      .crossJoin(broadcast(maxWk))
      .filter(col("wk") < col("max_wk"))
      .select((col("wk") * 604800).as("week_epoch"), col("n_active"),
        col("n_churned"))
      .orderBy(col("week_epoch"))
  }

  // -- H34: token co-occurrence association (PMI numerator, exact) ----------
  // Corpus-level token association over the TOP-V vocabulary: for every
  // pair of top-40 terms, how many documents contain both, scored by the
  // integer PMI proxy c_ab * n_docs * 1e6 div (df_a * df_b) (ppm of the
  // independence expectation; > 1e6 means positively associated). The
  // vocabulary cap is the scale contract: the corpus explodes ONCE into
  // distinct (doc, term); the vocab (40 rows) broadcasts back, so the
  // per-doc pair fan-out is bounded by C(40,2) = 780 whatever the doc
  // length, and the pair aggregate's key space is vocab², not corpus-
  // sized. A float log PMI could never hash-gate — the ppm ratio is the
  // same ranking, exactly.
  val q_cooccur_assoc: QueryDef = QueryDef(
    """WITH t AS (SELECT DISTINCT doc_id, term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents) WHERE term <> ''),
      |df AS (SELECT term, count(*) AS df FROM t GROUP BY term),
      |v AS (SELECT term, df FROM (
      |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rnk
      |    FROM df) WHERE rnk <= 40),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |tv AS (SELECT doc_id, term FROM t WHERE term IN (SELECT term FROM v)),
      |p AS (SELECT x.term AS term_a, y.term AS term_b, count(*) AS c_ab
      |  FROM tv x JOIN tv y ON x.doc_id = y.doc_id AND x.term < y.term
      |  GROUP BY term_a, term_b)
      |SELECT term_a, term_b, c_ab, va.df AS df_a, vb.df AS df_b,
      |  c_ab * n.n_docs * 1000000 // (va.df * vb.df) AS assoc_ppm
      |FROM p JOIN v va ON va.term = p.term_a JOIN v vb ON vb.term = p.term_b
      |CROSS JOIN n
      |ORDER BY term_a, term_b""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // shared materialized incidence frame — one tokenize per corpus
    // version however many text queries run (see TextAnalysis.corpusDocTerms)
    val t = TextAnalysis.corpusDocTerms(s, dir)
    val df = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // global top-40: TakeOrdered over vocab-sized input, then broadcast
    val vocab = df.orderBy(col("df").desc, col("term")).limit(40)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tv = t.join(broadcast(vocab.select("term")), "term")
    val pairs = tv.as("x")
      .join(tv.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("term_a"), col("y.term").as("term_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(vocab.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("c_ab"), col("df_a"), col("df_b"),
        expr("c_ab * n_docs * 1000000 div (df_a * df_b)").as("assoc_ppm"))
      .orderBy(col("term_a"), col("term_b"))
  }

  // -- C16: degree distribution of the co-purchase graph ---------------------
  // The first thing to look at before ANY graph algorithm at 100 TB: the
  // degree histogram (decimal-magnitude buckets — exact integer digit
  // count, immune to the float-log2 boundary noise a log-bucket would
  // carry into the hash gate). One degree aggregate + one histogram
  // aggregate over vertex-cardinality data.
  val q_degree_hist: QueryDef = QueryDef(
    s"""${CoreQueries.coPurchaseCtes},
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree
       |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v)
       |SELECT CAST(length(CAST(degree AS VARCHAR)) AS BIGINT) AS magnitude,
       |  count(*) AS n_vertices, min(degree) AS min_degree,
       |  max(degree) AS max_degree, CAST(sum(degree) AS BIGINT) AS sum_degree
       |FROM deg GROUP BY magnitude ORDER BY magnitude""".stripMargin) { (s, dir) =>
    val e = CoreQueries.coPurchaseEdges(s, dir)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
    deg.groupBy(length(col("degree").cast("string")).cast("long").as("magnitude"))
      .agg(count(lit(1)).as("n_vertices"), min("degree").as("min_degree"),
        max("degree").as("max_degree"), sum("degree").as("sum_degree"))
      .orderBy(col("magnitude"))
  }

  // -- H35: deterministic train/valid/test split -----------------------------
  // The split every training run needs, done the reproducible way: the
  // assignment is a pure md5 function of doc_id (90/5/5), identical
  // run-to-run, engine-to-engine, and under corpus growth (adding docs
  // never moves an existing doc between splits — the property an RNG or
  // a row_number-based split both lack). One corpus scan, zero shuffle
  // of the corpus; the report aggregates to split × source.
  val q_train_test_split: QueryDef = QueryDef(
    """WITH h AS (SELECT doc_id, source, n_chars,
      |    CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 1000 AS sk
      |  FROM documents)
      |SELECT CASE WHEN sk < 900 THEN 'train' WHEN sk < 950 THEN 'valid'
      |         ELSE 'test' END AS split,
      |  source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM h GROUP BY split, source ORDER BY split, source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("sk",
        graft.functions.Md5PrefixLong(
          concat(lit("split|"), col("doc_id").cast("string")), 15) % 1000)
      .withColumn("split",
        when(col("sk") < 900, "train").when(col("sk") < 950, "valid")
          .otherwise("test"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy(col("split"), col("source"))
  }

  // -- D19: join-key skew diagnostic -----------------------------------------
  // The pre-flight check before keying ANY 100 TB shuffle on a column:
  // the heaviest keys and their corpus share (ppm — integral, hash-
  // stable). A key above ~1/partitions share names the row that needs
  // Skew.saltedJoin or AQE skew splitting BEFORE the job runs, not after
  // a straggler task spills for an hour. Key-cardinality aggregate + one
  // broadcast scalar + TakeOrdered(20) — never a global sort.
  val q_key_skew: QueryDef = QueryDef(
    """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
      |SELECT user_id, cnt, cnt * 1000000 // total AS share_ppm
      |FROM c CROSS JOIN t
      |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val t = c.agg(sum("cnt").as("total"))
    c.crossJoin(broadcast(t))
      .select(col("user_id"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"))
      // unique user_id breaks cnt ties -> the LIMIT boundary is total-
      // ordered and engine-independent
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(20)
  }

  // -- D20: column completeness profile --------------------------------------
  // The dataset-card summary a curation pipeline emits per snapshot:
  // row count, per-column non-null counts, key cardinalities, id range —
  // one corpus scan, one row out. count(DISTINCT a), count(DISTINCT b)
  // in one aggregate costs an Expand (x2 scan rows) — accepted and named
  // here; the sketch family (H23) is the one-pass alternative when ±2%
  // suffices.
  val q_column_profile: QueryDef = QueryDef(
    """SELECT count(*) AS n_rows, count(ts) AS ts_nonnull,
      |  count(value) AS value_nonnull, count(props) AS props_nonnull,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT event_type) AS n_types,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).agg(
      count(lit(1)).as("n_rows"), count(col("ts")).as("ts_nonnull"),
      count(col("value")).as("value_nonnull"), count(col("props")).as("props_nonnull"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      min("event_id").as("min_id"), max("event_id").as("max_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_retention_cohorts" -> q_retention_cohorts,
    "q_churn_weekly" -> q_churn_weekly,
    "q_cooccur_assoc" -> q_cooccur_assoc,
    "q_degree_hist" -> q_degree_hist,
    "q_train_test_split" -> q_train_test_split,
    "q_key_skew" -> q_key_skew,
    "q_column_profile" -> q_column_profile)
}
