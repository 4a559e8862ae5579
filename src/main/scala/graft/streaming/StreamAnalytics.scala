package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** E3/E6 — windowed stream analytics over the `events` stream: the
  * extension surface SURVEY §2.E6 plans (the reference itself has no
  * event-time processing — everything is processing-time stamped), built
  * the Structured-Streaming way:
  *
  *  - event-time tumbling / session windows with a watermark bounding
  *    state (late rows beyond the watermark are dropped, state for closed
  *    windows is freed — the thing that makes unbounded streams runnable
  *    on bounded memory at scale);
  *  - arbitrary per-key state via flatMapGroupsWithState for what window
  *    functions can't express (running per-user aggregates with explicit
  *    eviction semantics).
  *
  * All transforms take a DataFrame so they run identically over
  * `readStream` (production) and `read` (the batch oracle queries in
  * CoreQueries use the same window exprs — q_window_tumbling /
  * q_session_window).
  */
object StreamAnalytics {

  /** Tumbling event-time windows per event type. */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("total"))

  /** Sliding event-time windows per event type (each event lands in
    * windowLen/slide overlapping windows; watermark still bounds state to
    * the open windows).
    */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("total"))

  /** Session windows (gap-based) per user. */
  def sessionStats(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("total"))

  /** Stream-stream interval join: enrich a left stream with right-stream
    * rows for the same key arriving within `[left.ts, left.ts + within]`.
    * Both sides carry watermarks and the join condition carries the time
    * range — that pair is what lets Spark EVICT buffered rows once the
    * watermark passes the interval, so join state is bounded by
    * (rate × within), not stream length. `joinType = "left_outer"` emits
    * unmatched left rows (right columns null) only after the watermark
    * proves no match can still arrive — the canonical
    * impressions-without-clicks shape.
    *
    * Column contract: left has (`ts`, `key`, ...), right has (`r_ts`,
    * `r_key`, ...) — distinct column names on the two sides keep the
    * output self-describing without aliasing gymnastics.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      within: String = "10 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    left.withWatermark("ts", watermark)
      .join(
        right.withWatermark("r_ts", watermark),
        expr(s"""key = r_key AND r_ts >= ts AND r_ts <= ts + interval $within"""),
        joinType)

  /** Streaming exact dedup with bounded state: first row per key wins;
    * a duplicate arriving within the watermark window is dropped; state
    * for a key is freed once the watermark passes its event time (so the
    * SAME key re-arriving much later is emitted again — the documented
    * trade: at-scale dedup state cannot be unbounded, and upstream
    * redelivery happens within the lateness bound, not weeks later).
    * Complements the content-hash batch dedup family (H1/H3b): this is
    * the ingest-time guard, those are the corpus-time sweep.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming twin of [[graft.temporal.Temporal.funnel]] (D6): per-key
    * first-touch funnel state advanced incrementally per micro-batch.
    * State per key is TWO integers (stage, last-step epoch) — bounded by
    * key cardinality however long the stream runs, vs the batch fold's
    * per-key event array.
    *
    * Ordering contract: rows are sorted (ep, ord) WITHIN a batch; across
    * batches the stream must deliver each key's events in order (the
    * Kafka per-partition guarantee the whole pipeline already leans on,
    * stream/kafka/kafka.go:76). Redelivery is safe when `steps` are
    * distinct event types: a duplicate of an already-consumed step finds
    * the accumulator past it and no-ops — StreamAnalyticsSpec pins both
    * the batch-equivalence (differential replay vs Temporal.funnel) and
    * the redelivery no-op.
    */
  final case class StepEvent(user_id: Long, ep: Long, ord: Long, et: String)
  final case class FunnelState(stage: Int, ep: Long)
  final case class FunnelProgress(user_id: Long, stage: Int, last_step_epoch: Option[Long])

  def streamingFunnel(
      events: Dataset[StepEvent],
      steps: Seq[String],
      windowSecs: Long): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, 0L))
          rows.toSeq.sortBy(e => (e.ep, e.ord)).foreach { e =>
            if (st.stage < steps.length && e.et == steps(st.stage) &&
              (st.stage == 0 || e.ep <= st.ep + windowSecs))
              st = FunnelState(st.stage + 1, e.ep)
          }
          state.update(st)
          FunnelProgress(user, st.stage, if (st.stage > 0) Some(st.ep) else None)
      }
  }

  /** Streaming twin of `CoreQueries.q_outlier_events` (D14): ONLINE
    * 2-sigma flagging — each event is tested against the integer
    * (n, S, SS) statistics of its key's stream SO FAR (itself included),
    * the causal semantics a live pipeline can actually compute (the
    * batch query sees the whole corpus's stats; this sees the prefix).
    * Same multiplied-out BIGINT predicate, (v*n - S)^2 > 4*(SS*n - S^2),
    * same documented int64 bounds. State per key is THREE longs —
    * bounded by key cardinality however long the stream runs.
    *
    * Ordering contract matches [[streamingFunnel]]: rows sorted (ep, ord)
    * within a batch, per-key order across batches from the transport.
    * Redelivery is NOT idempotent here (a replayed event re-enters the
    * running sums) — run behind [[dedupWithinWatermark]] or an
    * exactly-once source when the transport can redeliver.
    */
  final case class CentsEvent(user_id: Long, ep: Long, ord: Long, cents: Long)
  final case class OutlierState(n: Long, s: Long, ss: Long)
  final case class OutlierFlag(user_id: Long, ep: Long, ord: Long, cents: Long,
      n_so_far: Long, flagged: Boolean)

  def streamingOutliers(events: Dataset[CentsEvent]): Dataset[OutlierFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OutlierState, OutlierFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[CentsEvent], state: GroupState[OutlierState]) =>
          var st = state.getOption.getOrElse(OutlierState(0L, 0L, 0L))
          val out = rows.toSeq.sortBy(e => (e.ep, e.ord)).map { e =>
            st = OutlierState(st.n + 1, st.s + e.cents, st.ss + e.cents * e.cents)
            val dev = e.cents * st.n - st.s
            val flagged = st.n >= 2 && dev * dev > 4L * (st.ss * st.n - st.s * st.s)
            OutlierFlag(user, e.ep, e.ord, e.cents, st.n, flagged)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming twin of the bounded-heap top-k (D4, `q_topk_per_group`):
    * maintain each key's k best rows under (score DESC, id ASC) across
    * micro-batches. State is <= k (score, id) pairs per key however long
    * the stream runs — the same bound the batch aggregate's partial
    * buffers hold per task.
    *
    * Insert-only top-k is MONOTONE: a row outside the current top can
    * only fall further behind (nothing is ever deleted), so evicting it
    * from state is safe forever. `id` must be unique per key (the natural
    * row key) — it doubles as the idempotence key: a redelivered row
    * merges into its existing slot instead of inflating the top, so
    * at-least-once transports need no upstream dedup (unlike
    * [[streamingOutliers]], whose running sums are genuinely
    * redelivery-sensitive). Each batch re-emits the key's CURRENT top
    * (Update mode) — readers take the latest snapshot per key.
    */
  final case class ScoredRow(key: Long, score: Double, id: Long)
  final case class TopKState(scores: Seq[Double], ids: Seq[Long])
  final case class TopKSnapshot(key: Long, rn: Int, score: Double, id: Long)

  def streamingTopK(rows: Dataset[ScoredRow], k: Int): Dataset[TopKSnapshot] = {
    import rows.sparkSession.implicits._
    require(k > 0, s"k must be positive, got $k")
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[TopKState, TopKSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[ScoredRow], state: GroupState[TopKState]) =>
          val entries = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
          state.getOption.foreach(st =>
            st.ids.zip(st.scores).foreach { case (i, s) => entries(i) = s })
          it.foreach(r => entries(r.id) = r.score) // id-keyed merge = idempotent
          val top = entries.toSeq.map { case (i, s) => (s, i) }
            .sortBy { case (s, i) => (-s, i) }.take(k)
          state.update(TopKState(top.map(_._1), top.map(_._2)))
          top.iterator.zipWithIndex.map { case ((s, i), idx) =>
            TopKSnapshot(key, idx + 1, s, i)
          }
      }
  }

  /** Streaming twin of `CurationQueries.q_sessionize` (D21): assign each
    * event its user-local session ordinal ONLINE — a new session opens
    * when >gapSecs elapsed since the user's previous event. State per key
    * is TWO longs (last event epoch + current ordinal), bounded by key
    * cardinality however long the stream runs; the batch query's lag()
    * window needs the user's whole history in one sort — this fold sees
    * each event once. Ordering contract matches [[streamingFunnel]]:
    * rows sorted (ep, ord) within a batch, per-key order across batches
    * guaranteed by the transport. Replaying a prefix yields identical
    * ordinals (the fold is prefix-deterministic), which is what makes the
    * differential batch-vs-stream test meaningful.
    */
  final case class SessEvent(user_id: Long, ep: Long, ord: Long)
  final case class SessState(lastEp: Long, seq: Long)
  final case class SessAssign(user_id: Long, ep: Long, ord: Long, session_seq: Long)

  def streamingSessionize(
      events: Dataset[SessEvent],
      gapSecs: Long = 1800L): Dataset[SessAssign] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(0L, 0L))
          val out = rows.toSeq.sortBy(e => (e.ep, e.ord)).map { e =>
            val fresh = st.seq == 0L || e.ep - st.lastEp > gapSecs
            st = SessState(e.ep, if (fresh) st.seq + 1 else st.seq)
            SessAssign(user, e.ep, e.ord, st.seq)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming twin of `OpsQueries.q_transition_matrix` (D25): emit each
    * consecutive per-user (from, to) event-type transition ONLINE. State
    * per key is ONE (type, ep, ord) triple — the last event seen — bounded
    * by user cardinality however long the stream runs; the batch query's
    * lead() window sorts each user's whole history, this fold sees each
    * event once and joins it to its stored predecessor. Downstream the
    * pairs aggregate to the same matrix the batch query computes (the
    * differential spec counts them). Ordering contract matches
    * [[streamingFunnel]]: rows sorted (ep, ord) within a batch, per-key
    * order across batches from the transport.
    */
  final case class TypedEvent(user_id: Long, ep: Long, ord: Long, et: String)
  final case class LastTyped(et: String, ep: Long, ord: Long)
  final case class Transition(user_id: Long, from_type: String, to_type: String,
      ep: Long)

  def streamingTransitions(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastTyped, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[LastTyped]) =>
          var last = state.getOption
          val out = rows.toSeq.sortBy(e => (e.ep, e.ord)).flatMap { e =>
            val t = last.map(l => Transition(user, l.et, e.et, e.ep))
            last = Some(LastTyped(e.et, e.ep, e.ord))
            t
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Quantizer drift monitor — the index-maintenance loop a production
    * vector store runs beside its ingest: every windowed batch of arriving
    * vectors is scored against the FROZEN PQ codebooks
    * ([[graft.ext.Pq.reconstructionError]], a pure projection — the
    * codebooks are plan literals, nothing shuffles but the window
    * aggregate), and the window's mean error is emitted next to the
    * train-time baseline as a ppm ratio. A ratio drifting above ~1 says
    * the arriving distribution has left the codebook's geometry — retrain
    * BEFORE recall quietly degrades (the failure is silent otherwise:
    * codes still assign, searches still return, results just get worse).
    * Watermarked tumbling windows bound state exactly like
    * [[tumblingCounts]].
    */
  def pqDriftMonitor(
      vectors: DataFrame, // (ts timestamp, v array<float>)
      books: Seq[Seq[(Long, Seq[Double])]],
      baselineErr: Double,
      windowLen: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame =
    vectors
      .withColumn("err", graft.ext.Pq.reconstructionError(col("v"), books))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_vectors"), avg(col("err")).as("mean_err"))
      .select(col("window.start").as("win_start"), col("n_vectors"),
        col("mean_err"),
        (col("mean_err") * 1000000.0 / baselineErr).cast("long").as("drift_ppm"))

  /** E14 — streaming count-min sketch: the incremental twin of the batch
    * `q_countmin_freq` grid. Each micro-batch explodes its keys into the
    * d seeded md5 bucket hashes and a streaming aggregation keeps the
    * running (row, bucket) counters — state is EXACTLY d*w integers
    * whatever the key cardinality or stream length, which is the whole
    * point of the sketch (per-key streaming state is impossible when
    * keys are unbounded). Complete-mode output: the grid IS the result.
    * The same md5 derivation as the batch grid means the streamed
    * counters converge to the batch grid exactly once all rows are
    * processed (pinned by StreamCountMinSpec's prefix-equality replay).
    */
  def countMinStream(
      keyed: DataFrame, // one column `key` (string-castable)
      depth: Int = 4,
      width: Long = 256L): DataFrame =
    keyed
      .withColumn("i", explode(array((0 until depth).map(lit): _*)))
      .withColumn("b", pmod(graft.functions.Md5PrefixLong(
        concat(lit("cm"), col("i").cast("string"), lit("|"),
          col("key").cast("string")), 15), lit(width)))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** E15 — streaming decontamination gate: H20's ingest-time twin. Each
    * arriving document's distinct word 3-gram shingle hashes are checked
    * against the benchmark hash set INSIDE the row (array_intersect with
    * the set as a plan literal — benchmark suites are MB-scale at any
    * corpus size, the same bound that lets the batch query broadcast
    * them), so the operator is STATELESS: a pure per-row projection +
    * filter, append-mode, no watermark, no state store — a contaminated
    * doc is quarantined in the micro-batch it arrives in, and
    * redelivering a batch re-emits identical verdicts. Same md5 contract
    * as the batch decontaminate, pinned batch-equal by
    * StreamDecontamSpec.
    */
  def decontaminationGate(docs: DataFrame, benchHashes: Seq[Long]): DataFrame = {
    val hs = array_distinct(transform(
      graft.ext.TextAnalysis.shingles(graft.ext.TextAnalysis.tokens(col("text")), 3),
      x => graft.functions.Md5PrefixLong(x, 15)))
    docs
      .withColumn("n_hits",
        size(array_intersect(hs, typedlit(benchHashes))).cast("long"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_hits"))
  }

  /** Point estimate of one key against a collected count-min grid —
    * min over the key's d cells (driver-side; the grid is d*w ints).
    */
  def countMinEstimate(
      grid: Map[(Int, Long), Long], key: String,
      depth: Int = 4, width: Long = 256L): Long =
    (0 until depth).map { i =>
      val h = java.lang.Long.parseLong(
        graft.ext.TextAnalysis.md5hexJvm(s"cm$i|$key").substring(0, 15), 16)
      grid.getOrElse((i, ((h % width) + width) % width), 0L)
    }.min

  /** Per-user running totals with explicit state. */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total: Double)

  /** Custom-state path (flatMapGroupsWithState): cumulative per-user
    * count/sum, emitted on every update. ProcessingTimeTimeout keeps the
    * contract simple (no event-time column required in state); state per
    * key is two numbers — bounded by key cardinality, not stream length.
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(user, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }
}
