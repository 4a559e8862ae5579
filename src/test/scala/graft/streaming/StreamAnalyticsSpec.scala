package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Watermark + windowed-aggregation semantics over a MemoryStream: late
  * data beyond the watermark is dropped, closed windows are emitted
  * exactly once (append mode), and the custom-state path accumulates
  * across micro-batches.
  */
case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

class StreamAnalyticsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def t(minutes: Int) = new Timestamp(1704067200000L + minutes * 60000L)

  test("tumbling windows emit closed windows once; late data beyond watermark is dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamAnalytics
      .tumblingCounts(src.toDF(), windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode(OutputMode.Append())
      .start()
    try {
      // window [0,10): two events; then advance event time far enough that
      // the watermark (max_ts - 10m) passes 10:00 and closes it
      src.addData(Ev(t(1), "click", 1, 1.0), Ev(t(2), "click", 2, 2.0))
      q.processAllAvailable()
      src.addData(Ev(t(25), "click", 1, 5.0))
      q.processAllAvailable()
      // late straggler for the closed [0,10) window: beyond watermark, dropped
      src.addData(Ev(t(3), "click", 3, 100.0))
      q.processAllAvailable()
      // close [20,30) so its row is observable too
      src.addData(Ev(t(45), "other", 1, 0.5))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("tumbling").collect()
      .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("cnt"), r.getAs[Double]("total")))
    rows should contain((t(0), "click", 2L, 3.0)) // late 100.0 NOT included
    rows should contain((t(20), "click", 1L, 5.0))
    rows.map(_._1) should not contain t(40) // still open, not emitted
  }

  test("sliding windows place each event in window/slide overlapping windows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamAnalytics
      .slidingCounts(src.toDF(), windowLen = "10 minutes", slide = "5 minutes",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sliding").outputMode(OutputMode.Append())
      .start()
    try {
      src.addData(Ev(t(7), "click", 1, 1.0)) // windows [0,10) and [5,15)
      q.processAllAvailable()
      src.addData(Ev(t(40), "click", 1, 0.0)) // advance watermark, close both
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sliding").collect()
      .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Long]("cnt")))
    rows should contain(t(0) -> 1L)
    rows should contain(t(5) -> 1L) // the SAME event, second overlapping window
  }

  test("session windows merge events within the gap and split beyond it") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamAnalytics
      .sessionStats(src.toDF(), gap = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    try {
      src.addData(Ev(t(0), "c", 7, 1.0), Ev(t(3), "c", 7, 2.0), // one session
        Ev(t(20), "c", 7, 4.0)) // separate session (gap > 5m)
      q.processAllAvailable()
      src.addData(Ev(t(60), "c", 8, 0.0)) // advance watermark, close both
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("sess_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total")))
    rows should contain((7L, t(0), 2L, 3.0))
    rows should contain((7L, t(20), 1L, 4.0))
  }

  test("flatMapGroupsWithState accumulates per-user totals across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[StreamAnalytics.UserEvent]
    val q = StreamAnalytics.runningUserTotals(src.toDS())
      .writeStream.format("memory").queryName("running").outputMode(OutputMode.Update())
      .start()
    try {
      src.addData(StreamAnalytics.UserEvent(1, t(0), 1.0),
        StreamAnalytics.UserEvent(1, t(1), 2.0))
      q.processAllAvailable()
      src.addData(StreamAnalytics.UserEvent(1, t(2), 4.0),
        StreamAnalytics.UserEvent(2, t(2), 10.0))
      q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("running").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total")))
      .groupBy(_._1).map { case (u, g) => u -> g.maxBy(_._2) }
    last(1L) shouldBe ((1L, 3L, 7.0)) // state survived across batches
    last(2L) shouldBe ((2L, 1L, 10.0))
  }

  test("streaming funnel equals the batch fold on replay; redelivery no-ops") {
    import StreamAnalytics.StepEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val src = MemoryStream[StepEvent]
    val q = StreamAnalytics.streamingFunnel(src.toDS(), steps, windowSecs = 100L)
      .writeStream.format("memory").queryName("sfunnel").outputMode(OutputMode.Update())
      .start()
    val b1 = Seq(StepEvent(1, 10, 1, "view"), StepEvent(1, 50, 2, "click"),
      StepEvent(2, 10, 1, "view"))
    val b2 = Seq(StepEvent(1, 120, 3, "purchase"),
      StepEvent(2, 160, 2, "click")) // outside user 2's window: stalls at 1
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      src.addData(Seq(b2.head)); q.processAllAvailable() // redelivered purchase
    } finally q.stop()

    val streaming = spark.table("sfunnel").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"),
        Option(r.getAs[java.lang.Long]("last_step_epoch")).map(_.toLong)))
      .groupBy(_._1).map { case (u, g) => u -> g.maxBy(_._2) }
    streaming(1L) shouldBe ((1L, 3, Some(120L)))
    streaming(2L) shouldBe ((2L, 1, Some(10L)))

    // differential replay: the batch fold over the SAME events (dup
    // excluded — batch input is the deduped log) lands on the same state
    val batch = graft.temporal.Temporal.funnel(
      (b1 ++ b2).toDF("user_id", "ep", "ord", "et")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(
          org.apache.spark.sql.functions.col("ep"))),
      key = "user_id", ts = "ts", ord = "ord", et = "et",
      steps = steps, windowSecs = 100L)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("user_id"),
        r.getAs[Int]("stage"),
        Option(r.getAs[java.lang.Long]("last_step_epoch")).map(_.toLong)))).toMap
    batch shouldBe streaming
  }

  test("streaming sessionize equals the batch window assignment on ordered replay") {
    import StreamAnalytics.SessEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the real sf0.001 corpus, replayed in two time-ordered batches: the
    // epoch-threshold split preserves per-key order across batches (the
    // transport contract), so the streaming fold must land on EXACTLY the
    // batch window query's assignment for all 1000 events
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "CAST(ts AS LONG) AS ep", "event_id AS ord")
      .as[SessEvent].collect().sortBy(e => (e.ep, e.ord))
    val cut = evs(evs.length / 2).ep
    val (b1, b2) = evs.partition(_.ep <= cut)
    val src = MemoryStream[SessEvent]
    val q = StreamAnalytics.streamingSessionize(src.toDS())
      .writeStream.format("memory").queryName("ssess")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("ssess").collect()
      .map(r => r.getAs[Long]("ord") -> r.getAs[Long]("session_seq")).toMap
    val batch = graft.queries.CurationQueries.q_sessionize
      .fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    streaming.size shouldBe evs.length
    batch shouldBe streaming
  }

  test("streaming transitions aggregate to the batch Markov matrix on ordered replay") {
    import StreamAnalytics.TypedEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the real sf0.001 corpus replayed in two time-ordered batches (per-key
    // order across batches = the transport contract); the streamed pair
    // stream, aggregated, must equal q_transition_matrix's counts exactly
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "CAST(ts AS LONG) AS ep", "event_id AS ord",
        "event_type AS et")
      .as[TypedEvent].collect().sortBy(e => (e.ep, e.ord))
    val cut = evs(evs.length / 2).ep
    val (b1, b2) = evs.partition(_.ep <= cut)
    val src = MemoryStream[TypedEvent]
    val q = StreamAnalytics.streamingTransitions(src.toDS())
      .writeStream.format("memory").queryName("strans")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("strans").groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.queries.OpsQueries.q_transition_matrix
      .fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    batch shouldBe streamed
  }

  test("streaming outliers equal a sequential prefix-stats fold across batches") {
    import StreamAnalytics.CentsEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[CentsEvent]
    val q = StreamAnalytics.streamingOutliers(src.toDS())
      .writeStream.format("memory").queryName("soutlier").outputMode(OutputMode.Append())
      .start()
    // user 1: steady 100s then a spike; user 2: too few events to flag.
    // The spike needs n >= 6: the prefix stats INCLUDE the spike, and a
    // single extreme value among n-1 steady ones tends to exactly
    // (n-1)/sqrt(n-1) = sqrt(n-1) sigma from below — at n = 5 a lone
    // spike can NEVER exceed 2 sigma, however large (sqrt(4) = 2).
    val b1 = Seq(CentsEvent(1, 10, 1, 100), CentsEvent(1, 20, 2, 102),
      CentsEvent(1, 30, 3, 98), CentsEvent(2, 10, 1, 500))
    val b2 = Seq(CentsEvent(1, 40, 4, 101), CentsEvent(1, 45, 5, 99),
      CentsEvent(1, 50, 6, 5000), CentsEvent(2, 60, 2, 500))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("soutlier").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ep"),
        r.getAs[Long]("ord")) -> ((r.getAs[Long]("n_so_far"),
        r.getAs[Boolean]("flagged")))).toMap

    // sequential reference: per key in (ep, ord) order, integer prefix
    // stats including the current event
    val ref = (b1 ++ b2).groupBy(_.user_id).flatMap { case (_, evs) =>
      var (n, s, ss) = (0L, 0L, 0L)
      evs.sortBy(e => (e.ep, e.ord)).map { e =>
        n += 1; s += e.cents; ss += e.cents * e.cents
        val dev = e.cents * n - s
        (e.user_id, e.ep, e.ord) -> ((n, n >= 2 && dev * dev > 4L * (ss * n - s * s)))
      }
    }.toMap
    got shouldBe ref
    // the spike is flagged; the steady prefix is not; n=1 rows never flag
    got((1L, 50L, 6L))._2 shouldBe true
    got((1L, 30L, 3L))._2 shouldBe false
    got((1L, 10L, 1L))._2 shouldBe false
    got((2L, 10L, 1L))._1 shouldBe 1L
  }

  test("stateful operators run on the RocksDB state store (not executor heap)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamAnalytics
      .tumblingCounts(src.toDF(), windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("rocks").outputMode(OutputMode.Append())
      .start()
    try {
      src.addData(Ev(t(1), "click", 1, 1.0))
      q.processAllAvailable()
      // RocksDB-only custom metrics prove which provider actually ran —
      // a silently ignored conf would fall back to heap and still pass
      // every semantic test
      val metrics = q.lastProgress.stateOperators.apply(0).customMetrics
      metrics.keySet().toArray.exists(_.toString.startsWith("rocksdb")) shouldBe true
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window, inner and left-outer") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Clk]
    val q = StreamAnalytics
      .intervalJoin(imps.toDF(), clicks.toDF(),
        within = "10 minutes", watermark = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("ij").outputMode(OutputMode.Append())
      .start()
    try {
      imps.addData(Imp(t(0), 1, "ad_a"), Imp(t(1), 2, "ad_b"), Imp(t(2), 3, "ad_c"))
      // key 1: click inside [ts, ts+10m]; key 2: click too late (outside
      // the interval); key 3: no click at all
      clicks.addData(Clk(t(5), 1, "home"), Clk(t(30), 2, "home"))
      q.processAllAvailable()
      // advance BOTH watermarks far enough to prove no match can arrive
      // for keys 2/3 → their outer rows are emitted with null click cols
      imps.addData(Imp(t(60), 9, "ad_z"))
      clicks.addData(Clk(t(60), 9, "home"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("ij").collect()
      .map(r => (r.getAs[Long]("key"),
        Option(r.getAs[Timestamp]("r_ts")), Option(r.getAs[String]("page"))))
    rows should contain((1L, Some(t(5)), Some("home"))) // matched in-interval
    rows should contain((2L, None, None)) // click was outside the interval
    rows should contain((3L, None, None)) // never clicked
  }

  test("dropDuplicatesWithinWatermark dedups in-window, re-admits after expiry") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamAnalytics
      .dedupWithinWatermark(src.toDF(), Seq("user_id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append())
      .start()
    try {
      src.addData(Ev(t(0), "a", 1, 1.0), Ev(t(1), "b", 1, 2.0)) // dup key in batch
      q.processAllAvailable()
      src.addData(Ev(t(2), "c", 1, 3.0)) // dup key across batches, in window
      q.processAllAvailable()
      // advance the watermark past t(0)+10m → key 1's dedup state expires
      src.addData(Ev(t(30), "d", 2, 0.0))
      q.processAllAvailable()
      src.addData(Ev(t(31), "e", 1, 9.0)) // same key, after expiry → re-admitted
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("dedup").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    rows.count(_._1 == 1L) shouldBe 2 // first occurrence + post-expiry re-admit
    rows should contain((1L, "a"))
    rows should contain((1L, "e"))
    rows should not contain ((1L, "b")) // in-batch dup dropped
    rows should not contain ((1L, "c")) // cross-batch in-window dup dropped
  }

  test("streaming top-k equals the batch heap aggregate; redelivery and eviction safe") {
    import StreamAnalytics.ScoredRow
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[ScoredRow]
    val q = StreamAnalytics.streamingTopK(src.toDS(), k = 2)
      .writeStream.format("memory").queryName("stopk").outputMode(OutputMode.Update())
      .start()
    val b1 = Seq(ScoredRow(1, 10.0, 100), ScoredRow(1, 30.0, 101), ScoredRow(2, 5.0, 200))
    // 102 evicts 100 from key 1's top-2; the tie on 30.0 keeps the lower id first
    val b2 = Seq(ScoredRow(1, 30.0, 99), ScoredRow(1, 20.0, 102), ScoredRow(2, 7.0, 201))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      src.addData(Seq(b1(1), b2.head)); q.processAllAvailable() // redelivery: no-op
    } finally q.stop()

    // latest snapshot per key = rows of the final micro-batch that emitted it
    val snaps = spark.table("stopk").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Int]("rn"),
        r.getAs[Double]("score"), r.getAs[Long]("id")))
    def latest(key: Long): Seq[(Int, Double, Long)] = {
      // Update-mode memory sink appends; the final state of a key is its
      // LAST emitted snapshot group — reconstruct by taking the trailing
      // rows (rn restarts at 1 on each re-emission)
      val rows = snaps.filter(_._1 == key).map(t => (t._2, t._3, t._4))
      val lastStart = rows.lastIndexWhere(_._1 == 1)
      rows.drop(lastStart).toSeq
    }
    latest(1L) shouldBe Seq((1, 30.0, 99L), (2, 30.0, 101L))
    latest(2L) shouldBe Seq((1, 7.0, 201L), (2, 5.0, 200L))

    // differential: the batch bounded-heap aggregate over the SAME deduped
    // log lands on identical tops
    import spark.implicits._
    val batch = (b1 ++ b2).toDF("key", "score", "id")
      .groupBy($"key")
      .agg(graft.functions.TopKOrdered($"score", $"id", 2).as("top"))
      .select($"key", org.apache.spark.sql.functions.posexplode($"top"))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1,
        r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
    batch.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq shouldBe latest(1L)
    batch.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).toSeq shouldBe latest(2L)
  }

}

case class Imp(ts: Timestamp, key: Long, ad: String)
case class Clk(r_ts: Timestamp, r_key: Long, page: String)
