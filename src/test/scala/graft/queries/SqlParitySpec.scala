package graft.queries

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import graft.{SparkSpec, SparkEntry, Tables}

/** SQL-surface parity (VERDICT r8 next #7): the public API most users
  * will actually call is `spark.sql` over registered views — not the
  * DSL. Each test re-expresses one of the catalog's gnarliest queries
  * ENTIRELY as a single Spark SQL statement over temp views (plus the
  * extension-registered graft_* functions where the DSL uses them) and
  * asserts row-for-row frame equality with the declared DSL form. The
  * translations intentionally exercise the harder SQL surface: WINDOW
  * clauses, sorted-aggregate HOF folds, PIVOT, sequence-explode grid
  * joins, and the sorted-union as-of carry.
  *
  * Family coverage (r11, VERDICT r10 next #3) — one SQL-only form per
  * catalog family: scalar census G (q1_agg), decode/normalize B
  * (q_regex_normalize), graph C (q_triangle_count), temporal/analytics D
  * (scd2, asof, range, funnel, sessionize, concurrency, retention,
  * outliers, pivot), text H (q_token_count), dedup H (q_minhash_sig via
  * graft_shingle_hashes + the md5-derived minhash constants), similarity
  * H (q_similarity_topk via graft_dot + graft_topk_ordered), sampling H
  * (q_train_test_split via graft_md5_prefix_long). The mounted STORE
  * catalog's SQL face is oracle-gated by q_frame_sql (`VERSION AS OF`
  * through StoreCatalog) and pinned by StoreCatalogSpec. NOT
  * SQL-expressible (documented in SURVEY §F): the E-family streaming
  * operators (no SQL surface for foreachBatch folds / watermarked
  * state), the store WRITE lifecycle (A4/H64-66 — the catalog face is
  * read-only by design), and the mapPartitions codec round-trips
  * (H9/H10 — JVM codecs with no SQL function surface).
  */
class SqlParitySpec extends AnyFunSuite with SparkSpec with Matchers
    with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }

  /** Row-for-row equality: same column names, same values in the same
    * (ORDER BY-determined) order. Both sides order by a unique key, so
    * the comparison is deterministic.
    */
  private def assertParity(name: String, sql: String): Unit = {
    val dsl = SparkEntry.queries(name)(spark, dir)
    val viaSql = spark.sql(sql)
    viaSql.schema.fieldNames.toSeq shouldBe dsl.schema.fieldNames.toSeq
    val (d, q) = (dsl.collect(), viaSql.collect())
    q.length shouldBe d.length
    d.zip(q).zipWithIndex.foreach { case ((a, b), i) =>
      withClue(s"$name row $i: dsl=$a sql=$b — ") { b.toSeq shouldBe a.toSeq }
    }
  }

  test("q_scd2: SCD2 versioning via a WINDOW clause") {
    assertParity("q_scd2",
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  CAST(ts AS LONG) AS valid_from_epoch,
        |  lead(CAST(ts AS LONG)) OVER w AS valid_to_epoch,
        |  event_type
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin)
  }

  test("q_asof_join: sorted-union carry with ignore-null last_value") {
    assertParity("q_asof_join",
      """WITH v AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id
        |           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |u AS (
        |  SELECT user_id, view_ts AS ts, 0 AS pri,
        |    CAST(NULL AS BIGINT) AS event_id, view_id, view_ts FROM v
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS pri, event_id,
        |    CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP)
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, pri, event_id,
        |    last_value(view_id, true) OVER w AS view_id,
        |    last_value(view_ts, true) OVER w AS view_ts
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, pri
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, ts, view_id, view_ts
        |FROM c WHERE pri = 1 ORDER BY event_id""".stripMargin)
  }

  test("q_range_join: 15-min grid-cell equi-join with residual predicate") {
    assertParity("q_range_join",
      """WITH inc AS (SELECT event_id AS incident_id, ts AS w_start,
        |               ts + INTERVAL 1 HOUR AS w_end
        |             FROM events WHERE event_type = 'error'),
        |ic AS (SELECT incident_id, w_start, w_end,
        |         explode(sequence(CAST(w_start AS LONG) div 900,
        |                          CAST(w_end AS LONG) div 900)) AS cell
        |       FROM inc),
        |pe AS (SELECT ts, user_id, CAST(ts AS LONG) div 900 AS cell FROM events)
        |SELECT incident_id, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM ic JOIN pe ON ic.cell = pe.cell
        |  AND pe.ts >= ic.w_start AND pe.ts < ic.w_end
        |GROUP BY incident_id ORDER BY incident_id""".stripMargin)
  }

  test("q_funnel: per-user state machine as a sorted-aggregate HOF fold") {
    assertParity("q_funnel",
      """WITH seq AS (
        |  SELECT user_id,
        |    transform(
        |      array_sort(collect_list(
        |        struct(CAST(ts AS LONG) AS sec, event_id, event_type))),
        |      e -> concat(e.event_type, '|', CAST(e.sec AS STRING))) AS evs
        |  FROM events GROUP BY user_id),
        |f AS (
        |  SELECT user_id, aggregate(evs, '0|0', (acc, x) ->
        |    CASE
        |      WHEN split(acc, '\\|')[0] = '0' AND split(x, '\\|')[0] = 'view'
        |        THEN concat('1|', split(x, '\\|')[1])
        |      WHEN split(acc, '\\|')[0] = '1' AND split(x, '\\|')[0] = 'click'
        |        AND CAST(split(x, '\\|')[1] AS BIGINT)
        |          <= CAST(split(acc, '\\|')[1] AS BIGINT) + 86400
        |        THEN concat('2|', split(x, '\\|')[1])
        |      WHEN split(acc, '\\|')[0] = '2' AND split(x, '\\|')[0] = 'purchase'
        |        AND CAST(split(x, '\\|')[1] AS BIGINT)
        |          <= CAST(split(acc, '\\|')[1] AS BIGINT) + 86400
        |        THEN concat('3|', split(x, '\\|')[1])
        |      ELSE acc END) AS res
        |  FROM seq)
        |SELECT user_id, CAST(split(res, '\\|')[0] AS INT) AS stage,
        |  CASE WHEN split(res, '\\|')[0] <> '0'
        |       THEN CAST(split(res, '\\|')[1] AS BIGINT) END AS last_step_epoch
        |FROM f ORDER BY user_id""".stripMargin)
  }

  test("q_sessionize: gaps-and-islands session sequencing") {
    assertParity("q_sessionize",
      """WITH x AS (SELECT event_id, user_id, CAST(ts AS LONG) AS sec
        |  FROM events),
        |b AS (SELECT event_id, user_id, sec,
        |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
        |SELECT event_id, user_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |    AS BIGINT) AS session_seq
        |FROM b ORDER BY user_id, event_id""".stripMargin)
  }

  test("q_concurrency: two-level sweep-line cumulative windows") {
    assertParity("q_concurrency",
      """WITH mins AS (SELECT CAST(ts AS LONG) div 60 AS m FROM events),
        |deltas AS (SELECT m, 1 AS d FROM mins
        |  UNION ALL SELECT m + 30, -1 FROM mins),
        |per_min AS (SELECT m, m div 1440 AS day, CAST(sum(d) AS BIGINT) AS d
        |  FROM deltas GROUP BY m),
        |within AS (SELECT m, day, CAST(sum(d) OVER (PARTITION BY day ORDER BY m
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM per_min),
        |day_tot AS (SELECT day, CAST(sum(d) AS BIGINT) AS dt FROM per_min
        |  GROUP BY day),
        |carry AS (SELECT day, COALESCE(CAST(sum(dt) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS cin FROM day_tot),
        |active AS (SELECT w.m, w.day, w.cum + c.cin AS active
        |  FROM within w JOIN carry c ON w.day = c.day),
        |mx AS (SELECT day, max(active) AS max_concurrent FROM active GROUP BY day)
        |SELECT a.day * 86400 AS day_epoch, mx.max_concurrent,
        |  min(a.m) * 60 AS peak_epoch
        |FROM active a JOIN mx ON a.day = mx.day AND a.active = mx.max_concurrent
        |GROUP BY a.day, mx.max_concurrent
        |ORDER BY day_epoch""".stripMargin)
  }

  test("q_triangle_count: co-purchase triangle enumeration") {
    assertParity("q_triangle_count",
      """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS item
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |e AS (SELECT DISTINCT x.item AS a, y.item AS b
        |  FROM li x JOIN li y ON x.k = y.k AND x.item < y.item),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |nodes AS (SELECT u AS part FROM tri
        |  UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_tri
        |FROM nodes GROUP BY part ORDER BY part""".stripMargin)
  }

  test("q_retention_cohorts: cohort-week retention matrix") {
    assertParity("q_retention_cohorts",
      """WITH uw AS (SELECT DISTINCT user_id, CAST(ts AS LONG) div 604800 AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
        |SELECT cw * 604800 AS cohort_epoch, wk - cw AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY cohort_epoch, week_offset
        |ORDER BY cohort_epoch, week_offset""".stripMargin)
  }

  test("q_outlier_events: integer-exact 2-sigma outliers") {
    assertParity("q_outlier_events",
      """WITH v AS (SELECT event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT user_id, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(cents * cents) AS BIGINT) AS ss
        |  FROM v GROUP BY user_id)
        |SELECT event_id, v.user_id, cents, n,
        |  (cents * n - s) * (cents * n - s) AS dev2_n2,
        |  4 * (ss * n - s * s) AS four_var_n2
        |FROM v JOIN st ON v.user_id = st.user_id
        |WHERE n >= 2 AND (cents * n - s) * (cents * n - s) > 4 * (ss * n - s * s)
        |ORDER BY event_id""".stripMargin)
  }

  test("q_pivot_events: native SQL PIVOT") {
    assertParity("q_pivot_events",
      """SELECT user_id,
        |  CAST(coalesce(`view`, 0) AS BIGINT) AS view,
        |  CAST(coalesce(click, 0) AS BIGINT) AS click,
        |  CAST(coalesce(purchase, 0) AS BIGINT) AS purchase,
        |  CAST(coalesce(signup, 0) AS BIGINT) AS signup,
        |  CAST(coalesce(error, 0) AS BIGINT) AS error
        |FROM (SELECT user_id, event_type FROM events)
        |  PIVOT (count(*) FOR event_type
        |         IN ('view' AS `view`, 'click' AS click, 'purchase' AS purchase,
        |             'signup' AS signup, 'error' AS error))
        |ORDER BY user_id""".stripMargin)
  }

  test("q1_agg: scalar census family as plain aggregate SQL") {
    assertParity("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_cents,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_cents,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sum_disc_price_e4,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q_regex_normalize: decode/normalize family via RLIKE branches") {
    assertParity("q_regex_normalize",
      """SELECT normalized, count(*) AS cnt FROM (
        |  SELECT CASE
        |    WHEN raw RLIKE '^arn:aws:iam::[0-9]{12}:root$' THEN raw
        |    WHEN raw RLIKE '^[0-9]{12}$'
        |      THEN concat('arn:aws:iam::', raw, ':root')
        |    END AS normalized
        |  FROM (SELECT CASE
        |      WHEN event_type = 'purchase'
        |        THEN concat('arn:aws:iam::', lpad(CAST(user_id AS STRING), 12, '0'), ':root')
        |      WHEN event_type = 'click' THEN 'not-an-account'
        |      ELSE lpad(CAST(user_id AS STRING), 12, '0') END AS raw
        |    FROM events) r) t
        |GROUP BY normalized ORDER BY normalized ASC NULLS FIRST""".stripMargin)
  }

  test("q_token_count: text family via split + regexp_extract_all") {
    assertParity("q_token_count",
      s"""SELECT doc_id, size(split(text, ' ')) AS n_ws_tokens,
         |  size(regexp_extract_all(text,
         |    '${graft.ext.TextAnalysis.TokenRegex}', 0)) AS n_re_tokens
         |FROM documents ORDER BY doc_id""".stripMargin)
  }

  test("q_similarity_topk: similarity family via graft_dot + graft_topk_ordered") {
    assertParity("q_similarity_topk",
      """WITH e AS (SELECT vec_id, embedding AS v,
        |    sqrt(graft_dot(embedding, embedding)) AS nrm FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e WHERE vec_id < 5),
        |s AS (SELECT query_id, graft_dot(qv, v) / (qn * nrm) AS cos, vec_id
        |  FROM e JOIN q ON query_id <> vec_id),
        |g AS (SELECT query_id, graft_topk_ordered(cos, vec_id, 3) AS top
        |  FROM s GROUP BY query_id)
        |SELECT query_id, t.id AS vec_id, round(t.score, 6) AS cosine,
        |  CAST(pos + 1 AS INT) AS rnk
        |FROM g LATERAL VIEW posexplode(top) x AS pos, t
        |ORDER BY query_id, rnk""".stripMargin)
  }

  test("q_minhash_sig: dedup family via graft_shingle_hashes + shared minhash constants") {
    assertParity("q_minhash_sig",
      s"""SELECT doc_id,
         |  ${(0 until 8).map(k => graft.ext.Dedup.mhSparkSql(k) + s" AS mh$k").mkString(",\n  ")}
         |FROM (SELECT doc_id, graft_shingle_hashes(split(text, ' '), 3) AS hs
         |      FROM documents) t
         |ORDER BY doc_id""".stripMargin)
  }

  test("q_train_test_split: sampling family via graft_md5_prefix_long") {
    assertParity("q_train_test_split",
      """WITH h AS (SELECT doc_id, source, n_chars,
        |    graft_md5_prefix_long(concat('split|', CAST(doc_id AS STRING)), 15) % 1000 AS sk
        |  FROM documents)
        |SELECT CASE WHEN sk < 900 THEN 'train' WHEN sk < 950 THEN 'valid'
        |         ELSE 'test' END AS split,
        |  source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM h GROUP BY split, source ORDER BY split, source""".stripMargin)
  }
}
