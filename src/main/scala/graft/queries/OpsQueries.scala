package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Md5PrefixLong

/** Pipeline-operations operators: sequence modeling over the event stream,
  * deterministic weighted sampling, skip-gram extraction, distribution-drift
  * monitoring, curriculum ordering with a distributed global index, and
  * storage-compaction planning.
  *
  * Cross-engine exactness rules as everywhere (CoreQueries header): BIGINT
  * arithmetic in hashed output, integral `div`, md5 keep/order decisions
  * instead of RNG, `round(value*100)` cents for the one double column.
  */
object OpsQueries {

  // -- D25: event-type transition matrix (first-order Markov) ----------------
  // P(next event | event) per user journey — the sequence-model prior and
  // the product-flow sanity check in one. Scale shape: ONE shuffle keys
  // the corpus by user_id for the lead() window (each user's history
  // sorts independently inside its partition — no global sort), then the
  // pair aggregate's key space is |event_types|² (25 here), map-side
  // combined; the per-from totals are a vocab-sized broadcast. The ppm
  // probability is integral — a float ratio could never hash-gate.
  val q_transition_matrix: QueryDef = QueryDef(
    """WITH s AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |p AS (SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM p GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n, p.n * 1000000 // t.tot AS prob_ppm
      |FROM p JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
    val p = seq.filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val t = p.groupBy(col("from_type")).agg(sum("n").as("tot"))
    p.join(broadcast(t), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div tot").as("prob_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // -- H57: weighted sampling per stratum (integer-lattice A-ES) -------------
  // Weight-biased top-k per source with zero RNG: each doc's priority is
  // md5(doc_id) div weight — an integral transliteration of the A-ES
  // priority u^(1/w) (heavier docs draw stochastically smaller
  // priorities), reproducible run-to-run and engine-to-engine where a
  // float -ln(u)/w would diverge in the last ulp and flip ranks at the
  // cut boundary. One corpus scan; the per-stratum top-10 is a bounded
  // window (scale path for huge strata: per-partition heap + re-rank of
  // the k·partitions survivors, as in topKPerGroup).
  val q_weighted_sample: QueryDef = QueryDef(
    """WITH w AS (SELECT doc_id, source, n_chars,
      |    CAST('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) // n_chars AS priority
      |  FROM documents WHERE n_chars >= 1)
      |SELECT source, doc_id, n_chars, priority,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY priority, doc_id) AS BIGINT) AS rnk
      |FROM w QUALIFY rnk <= 10
      |ORDER BY source, rnk""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("n_chars") >= 1)
      .withColumn("pk",
        Md5PrefixLong(concat(lit("ws|"), col("doc_id").cast("string")), 15))
      .withColumn("priority", expr("pk div n_chars"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("priority"), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("source"), col("doc_id"), col("n_chars"), col("priority"),
        col("rnk"))
      .orderBy(col("source"), col("rnk"))
  }

  // -- H58: skip-gram pair extraction (embedding-training prep) --------------
  // Directional (center, context) counts for a ±3 token window over the
  // TOP-V vocabulary — the word2vec/PMI input matrix. The vocab cap is
  // the scale contract (same as q_cooccur_assoc): positions explode once,
  // the 50-term vocab broadcasts back, and the pair join is doc-keyed
  // with window-bounded fan-out (≤3 contexts per position), so shuffled
  // rows stay O(tokens), never O(tokens²). Spark joins on doc_id with a
  // position-range predicate; the oracle does the identical join — the
  // 0- vs 1-based position origins cancel in the difference.
  val q_skipgram_pairs: QueryDef = QueryDef(
    """WITH t0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |t AS (SELECT doc_id, term, CAST(pos AS BIGINT) AS pos FROM t0
      |  WHERE term <> ''),
      |v AS (SELECT term FROM (
      |    SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) AS rnk
      |    FROM t GROUP BY term) WHERE rnk <= 50),
      |tv AS (SELECT doc_id, term, pos FROM t
      |  WHERE term IN (SELECT term FROM v))
      |SELECT x.term AS center, y.term AS context,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM tv x JOIN tv y
      |  ON x.doc_id = y.doc_id AND y.pos - x.pos BETWEEN 1 AND 3
      |GROUP BY center, context
      |ORDER BY center, context""".stripMargin) { (s, dir) =>
    // shared materialized token frame — one tokenize per corpus version
    // however many text queries run (see TextAnalysis.corpusTokens)
    val t = graft.ext.TextAnalysis.corpusTokens(s, dir)
      .select(col("doc_id"), col("term"), col("pos"))
    val vocab = t.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(50).select("term")
    val tv = t.join(broadcast(vocab), "term").select("doc_id", "term", "pos")
    tv.as("x").join(tv.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
          (col("y.pos") - col("x.pos")).between(1, 3))
      .groupBy(col("x.term").as("center"), col("y.term").as("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("center"), col("context"))
  }

  // -- D26: distribution drift (early half vs late half) ---------------------
  // The monitoring query that catches a silently-changed upstream: per
  // event type, volume and value mass on either side of the corpus'
  // temporal midpoint, with the count drift in ppm. The midpoint is ONE
  // broadcast scalar (min/max epoch-seconds agg); everything else is a
  // single conditional aggregate over one scan — no self-join of eras.
  // cents = round(value*100) is the engine's one exact double→int bridge.
  val q_stat_drift: QueryDef = QueryDef(
    """WITH e AS (SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |b AS (SELECT (min(sec) + max(sec)) // 2 AS thr FROM e)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN sec < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
      |  CAST(sum(CASE WHEN sec >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(sum(CASE WHEN sec < thr THEN cents ELSE 0 END) AS BIGINT)
      |    AS cents_early,
      |  CAST(sum(CASE WHEN sec >= thr THEN cents ELSE 0 END) AS BIGINT)
      |    AS cents_late,
  |  CAST((sum(CASE WHEN sec >= thr THEN 1 ELSE 0 END)
      |    - sum(CASE WHEN sec < thr THEN 1 ELSE 0 END)) * 1000000
      |    // greatest(sum(CASE WHEN sec < thr THEN 1 ELSE 0 END), 1)
      |    AS BIGINT) AS count_drift_ppm
      |FROM e CROSS JOIN b GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("long").as("sec"),
        round(col("value") * 100).cast("long").as("cents"))
    val b = e.agg(expr("(min(sec) + max(sec)) div 2").as("thr"))
    e.crossJoin(broadcast(b))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("sec") < col("thr"), 1L).otherwise(0L)).as("n_early"),
        sum(when(col("sec") >= col("thr"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("sec") < col("thr"), col("cents")).otherwise(0L))
          .as("cents_early"),
        sum(when(col("sec") >= col("thr"), col("cents")).otherwise(0L))
          .as("cents_late"))
      .withColumn("count_drift_ppm",
        expr("(n_late - n_early) * 1000000 div greatest(n_early, 1)"))
      .orderBy(col("event_type"))
  }

  // -- H59: curriculum ordering with a distributed global index --------------
  // Training order without a global sort: docs ordered by curriculum band
  // (length quartile — short first) and md5-shuffled within band, with an
  // EXACT global position for every doc. The md5 key is range-sharded
  // (top 5 bits → 32 shards, monotone in the key), so (band, shard)
  // prefix counts — ≤128 rows, a bounded driver-side frame — turn
  // per-shard ranks into global positions. No partition ever sees more
  // than corpus/32 rows of any band; the oracle's single row_number()
  // OVER the whole corpus proves the sharded index is exactly the global
  // one.
  val q_curriculum: QueryDef = QueryDef(
    """WITH x AS (SELECT doc_id, least(n_chars // 200, 3) AS band,
      |    CAST('0x' || substr(md5('cur|' || CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) AS sk
      |  FROM documents)
      |SELECT doc_id, CAST(band AS BIGINT) AS band,
      |  CAST(row_number() OVER (ORDER BY band, sk, doc_id) AS BIGINT)
      |    AS train_pos
      |FROM x ORDER BY train_pos""".stripMargin) { (s, dir) =>
    // 2^55: md5-prefix keys span [0, 2^60); div 2^55 → 32 range shards,
    // monotone in sk, so (band, shard, sk, doc_id) order == (band, sk,
    // doc_id) order and prefix offsets compose to the global rank.
    val shardDiv = 1L << 55
    val x = Tables.documents(s, dir)
      .select(col("doc_id"),
        least(expr("n_chars div 200"), lit(3)).cast("long").as("band"),
        Md5PrefixLong(concat(lit("cur|"), col("doc_id").cast("string")), 15)
          .as("sk"))
      .withColumn("shard", expr(s"sk div ${shardDiv}L"))
    // ≤ 4 bands × 32 shards = 128 rows — a BOUNDED driver collect (same
    // contract as the StateStore bucket-id sets / Selection histograms):
    // the exclusive prefix sum runs in Scala and goes back as a broadcast
    // dimension, keeping the distributed plan window-free above shard
    // granularity.
    val counts = x.groupBy(col("band"), col("shard"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val offsets = counts.scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (b, sh, c)) =>
      (b, sh, acc + c)
    }.init.zip(counts).map { case ((_, _, off0), (b, sh, _)) => (b, sh, off0) }
    // scanLeft pairs each (band, shard) with the sum of all EARLIER groups
    val offsetsDf = {
      import s.implicits._
      offsets.toSeq.toDF("band", "shard", "off")
    }
    x.join(broadcast(offsetsDf), Seq("band", "shard"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("shard"))
          .orderBy(col("sk"), col("doc_id"))))
      .select(col("doc_id"), col("band"),
        (col("off") + col("rn")).cast("long").as("train_pos"))
      .orderBy(col("train_pos"))
  }

  // -- D27: storage compaction planner ---------------------------------------
  // The lakehouse maintenance pre-pass: per (source, lang) partition, how
  // many target files a compaction should emit (64 KB-of-chars target
  // here; bytes in production) and the resulting packing density. Pure
  // single-scan aggregate — the plan is metadata-sized however big the
  // corpus — and integral ceil-division keeps it hash-exact.
  val q_compaction_plan: QueryDef = QueryDef(
    """SELECT source, lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars,
      |  (CAST(sum(n_chars) AS BIGINT) + 63999) // 64000 AS n_files,
      |  count(*) // ((CAST(sum(n_chars) AS BIGINT) + 63999) // 64000)
      |    AS docs_per_file
      |FROM documents GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        max("n_chars").as("max_chars"))
      .withColumn("n_files", expr("(sum_chars + 63999) div 64000"))
      .withColumn("docs_per_file", expr("n_docs div n_files"))
      .orderBy(col("source"), col("lang"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_transition_matrix" -> q_transition_matrix,
    "q_weighted_sample" -> q_weighted_sample,
    "q_skipgram_pairs" -> q_skipgram_pairs,
    "q_stat_drift" -> q_stat_drift,
    "q_curriculum" -> q_curriculum,
    "q_compaction_plan" -> q_compaction_plan)
}
