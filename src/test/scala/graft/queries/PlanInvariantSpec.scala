package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkEntry, SparkSpec}

/** Catalog-wide physical-plan invariants — the scale contract, enforced:
  * a query that silently degenerates to a cartesian product, an
  * unintended nested-loop join, or an unpartitioned global window would
  * pass the row-level oracle at sf0.01 and then melt at 100 TB. Every
  * exception is whitelisted HERE with its justification, so a plan
  * regression (or an unjustified new exception) fails `sbt test`.
  */
class PlanInvariantSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  /** Deliberate BroadcastNestedLoopJoin: tiny broadcast side vs one linear
    * scan (the exact-top-k baseline and the IVF/SemDeDup centroid
    * assignments all broadcast a handful of rows against the corpus — no
    * shuffle of the big side, bounded by design).
    */
  private val allowNestedLoop =
    Set("q_similarity_topk", "q_similarity_topk_q8", "q_similarity_ivf",
      // q_pq_adc / q_pq_rerank / q_hard_negatives: the NQueries-row query
      // frame broadcast against the corpus scan — same shape as
      // q_similarity_topk.
      "q_pq_adc", "q_pq_rerank", "q_hard_negatives",
      // q_opq_search (r12): the same NQueries-row broadcast ADC-shortlist
      // shape as q_pq_rerank, over the OPQ-rotated codes.
      "q_opq_search",
      // q_boilerplate_strip: two deliberate ONE-ROW broadcast cross joins
      // (the corpus-count scalar into the DF threshold; the flagged-token
      // array against the corpus scan) — each moves a single row.
      "q_boilerplate_strip",
      // q_churn_weekly: the max-observed-week scalar (one row) broadcast
      // against the week-cardinality report to exclude the last week.
      "q_churn_weekly",
      // q_cooccur_assoc: the n_docs scalar (one row) broadcast into the
      // vocab²-bounded pair frame for the ppm association score.
      "q_cooccur_assoc",
      // q_key_skew: the corpus-total scalar (one row) broadcast against
      // the key-cardinality count frame for the ppm share.
      "q_key_skew",
      // q_bm25_rational: the n_docs and sum_dl scalars (one row each)
      // broadcast into the per-(doc, q-term) scoring frame.
      "q_bm25_rational",
      // q_freshness: the global-tip scalar (one row) broadcast against
      // the type-cardinality report for the lag column.
      "q_freshness",
      // q_stat_drift: the temporal-midpoint scalar (one row) broadcast
      // against the corpus scan for the era split — same shape as
      // q_key_skew's total.
      "q_stat_drift",
      // q_rrf_fusion: the NQueries-row quantized-query frame broadcast
      // against one corpus scan for the vector shortlist — same shape as
      // q_similarity_topk_q8.
      "q_rrf_fusion")

  /** Deliberate single-partition exchange: a point lookup returning ≤1 row
    * (the exchange moves one row, not the table).
    */
  private val allowSinglePartition = Set("q_lookup_join",
    // q_boilerplate_strip: the flagged-token set is collapsed to ONE array
    // row by a global collect_list — the exchange moves per-partition
    // partials of a tiny high-DF term set, not the corpus.
    "q_boilerplate_strip",
    // q_churn_weekly / q_cooccur_assoc / q_key_skew / q_column_profile:
    // the single-partition exchange feeds a SCALAR final aggregate (max
    // week / corpus count / corpus total / the one-row profile) — it
    // moves one partial row per upstream partition, never data-scale rows.
    "q_churn_weekly", "q_cooccur_assoc", "q_key_skew", "q_column_profile",
    // q_bm25_rational: same scalar-aggregate shape (corpus doc count +
    // total token count), one partial row per upstream partition.
    "q_bm25_rational",
    // q_freshness: the global-tip scalar aggregate.
    "q_freshness",
    // q_jaccard_sweep: the one-row sweep is itself a scalar aggregate
    // over the candidate frame — partials only through the exchange.
    "q_jaccard_sweep",
    // q_stat_drift: the min/max-epoch midpoint is a scalar aggregate —
    // one partial row per upstream partition through the exchange.
    "q_stat_drift")

  /** Deliberate unpartitioned windows, as an EXACT per-query node count.
    * EMPTY since r8: q_concurrency's day-carry — the catalog's last
    * global window — became a bounded driver-side prefix sum re-entering
    * as a broadcast local relation, so ANY unpartitioned WindowExec
    * anywhere in the catalog now fails this suite (and would warn under
    * the guardrail rule's new default).
    */
  private val allowGlobalWindow = Map.empty[String, Int]

  /** A SinglePartition exchange is a violation UNLESS it feeds a
    * bloom_filter_agg — Spark's injected runtime row-filter aggregates a
    * small build side into one bloom filter by design (the parent
    * ObjectHashAggregate sits 1-2 lines above the exchange in the plan
    * rendering); flagging it would ban a scale OPTIMIZATION.
    */
  private def straySinglePartition(plan: String): Boolean = {
    val lines = plan.split("\n")
    lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange SinglePartition") &&
        !lines.slice(math.max(i - 2, 0), i).exists(_.contains("bloom_filter_agg"))
    }
  }

  test("filters and projections reach the parquet scan (pushdown + pruning)") {
    // representative scan-shaped query: the point filter must arrive at
    // the reader as a pushed filter (row-group skipping at scale) and the
    // scan must read ONLY the referenced columns — a scan reading all
    // columns for a 2-column projection re-reads the corpus for nothing
    val plan = SparkEntry.queries("q_meta_extract")(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]")
    plan should include("ReadSchema: struct<event_id:bigint,props:string>")
  }

  test("IVF cell assignment is a pure projection: no window/join/exchange over the corpus") {
    // the index-build scale contract (VERDICT r4 #1): the coarse-quantize
    // pass must touch each corpus row ONCE — the previous plan crossed the
    // corpus with the broadcast centroids and ranked with a window,
    // shuffling and sorting corpus×nlist rows (4096× amplification at the
    // nlist clamp). With the ArgmaxCell projection the plan is scan →
    // project, nothing else.
    val e = graft.ext.Similarity.embFrame(spark, dir)
    val cents = graft.ext.Similarity.ivfCentroidsKmeans(e, nlist = 4, iters = 1)
    val plan = graft.ext.Similarity.assignCells(e, cents)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Exchange"
    plan should not include "Join"
    plan should include("graft_argmax_cell")
  }

  test("IVFADC serve path: the code scan is cell-pruned, never full-corpus") {
    // the operator exists to retire q_pq_adc's full-corpus ADC scan
    // (VERDICT r10 next #1): the probe's cells must gate the code table
    // as a LITERAL filter before any ADC work, so per-query work is
    // nprobe × cell size at any corpus scale
    val plan = SparkEntry.queries("q_ivfpq_search")(spark, dir)
      .queryExecution.executedPlan.toString
    (plan should include).regex(raw"Filter \(?cell#\d+L IN \(")
    plan should not include "BroadcastNestedLoopJoin"
    // and against the PERSISTED code table (the 100 TB path) the same
    // filter reaches the parquet reader as a pushed predicate —
    // row-group pruning at the scan, not a post-read filter
    val root = graft.ext.VectorIndex.storeRootFor(dir)
    val stored = graft.ext.VectorIndex.ivfPqCodes(spark, root)
      .filter(org.apache.spark.sql.functions.col("cell").isin(0L, 1L))
      .queryExecution.executedPlan.toString
    (stored should include).regex(raw"PushedFilters: \[In\(cell")
  }

  test("top-k per group is a bounded heap aggregate, not a window sort") {
    // the D4 scale contract: the plan must aggregate (partial heaps ship
    // <= k rows per map task per key through the exchange) — a Window
    // node here would mean every row of a group shuffles to one reducer
    // and sorts, the shape that dies on a key with 10^8 rows
    val plan = SparkEntry.queries("q_topk_per_group")(spark, dir)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("ObjectHashAggregate")
    plan should include("graft_topk_ordered")
  }

  /** See [[graft.tools.PlanWalk.unpartitionedWindows]] — shared with the
    * PlanAudit diagnostic so tool and enforcement agree on the count.
    */
  private def unpartitionedWindows(
      p: org.apache.spark.sql.execution.SparkPlan): Int =
    graft.tools.PlanWalk.unpartitionedWindows(p)

  test("no catalog query plans a cartesian product, stray nested loop, or global window") {
    // audit the SCALE path: the size-adaptive graph ops (kCore, connected
    // components) dispatch to a deliberate single-task kernel under their
    // edge thresholds — at sf0.001 every graph fits, which would flag
    // their repartition(1) in seven queries. Pin the dispatch to the
    // dataflow form here; the local kernels are property-tested against
    // the same fixpoints in their own specs, and their SinglePartition is
    // bounded BY the threshold conf, not by data.
    val adaptiveConfs = Seq(
      "spark.graft.kcore.localEdgeLimit", "spark.graft.cc.localEdgeLimit",
      "spark.graft.pagerank.localEdgeLimit", "spark.graft.labelprop.localEdgeLimit",
      "spark.graft.closure.localEdgeLimit")
    adaptiveConfs.foreach(spark.conf.set(_, "0"))
    val physical =
      try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> fn(spark, dir).queryExecution.executedPlan
      }
      finally adaptiveConfs.foreach(spark.conf.unset)
    // exact-set check: every query's unpartitioned-WindowExec count must
    // match the whitelist — a NEW corpus-scale global window fails here,
    // and a whitelisted one that disappears flags the stale entry too
    val withGlobalWindows = physical
      .map { case (name, p) => name -> unpartitionedWindows(p) }
      .filter(_._2 > 0).toMap
    withClue(s"unpartitioned WindowExec per query: $withGlobalWindows\n") {
      withGlobalWindows shouldBe allowGlobalWindow
    }
    val plans = physical.map { case (n, p) => n -> p.toString }
    // exact-set: a whitelisted shape that DISAPPEARS flags its stale
    // entry, same as the window check (q_semdedup's nested loop went away
    // with the ArgmaxCell rewrite and sat stale for two rounds)
    plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet shouldBe allowNestedLoop
    plans.collect {
      case (n, p) if straySinglePartition(p) => n
    }.toSet shouldBe allowSinglePartition
    val violations = plans.flatMap { case (name, plan) =>
      Seq(
        Option.when(plan.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        // (?m): Window nodes are mid-plan lines, never the end of the
        // whole plan string — without MULTILINE the anchor can never match.
        // A two-bracket Window line is global ONLY when its trailing
        // bracket is an ORDER spec (carries a sort direction) — a
        // partitioned-but-unordered window (e.g. min() over partitionBy
        // with no orderBy) also prints two brackets, but its partition
        // spec holds plain attributes with no ASC/DESC.
        Option.when(
          raw"(?m)^.*Window \[[^\]]*\], \[[^,\]]* (?:ASC|DESC)[^\]]*\]$$".r
            .findFirstIn(plan).isDefined
            && !allowGlobalWindow.contains(name))(
          s"$name: Window without partitionBy")
      ).flatten
    }
    withClue(violations.mkString("\n")) { violations shouldBe empty }
  }
}
