package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import StreamTws.{ClosedSession, SessEv}

/** `transformWithState` session finalizer (E11): event-time timers close
  * sessions exactly once when the watermark proves they cannot grow;
  * state frees on close; the closed-session set equals the batch
  * session rollup on full replay.
  */
class StreamTwsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(ep: Long) = new java.sql.Timestamp(ep * 1000L)

  private def runBatches(name: String, gapSecs: Long, watermark: String)(
      batches: Seq[SessEv]*): Seq[ClosedSession] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[SessEv]
    val q = StreamTws.closedSessions(src.toDS(), gapSecs, watermark)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try batches.foreach { b => src.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[ClosedSession].collect().toSeq
  }

  test("watermark passing last_event+gap closes the session exactly once, with its stats") {
    // user 1's two events sit 100 s apart (one session); the user-99
    // sentinel in batch 2 advances the watermark far past 200+1800, so
    // the event-time timer fires and emits ONE closed row
    val out = runBatches("tws_close", 1800L, "10 minutes")(
      Seq(SessEv(1L, ts(100), 1), SessEv(1L, ts(200), 2)),
      Seq(SessEv(99L, ts(100000), 3)),
      Seq(SessEv(99L, ts(100001), 4)))
    out.filter(_.user_id == 1L) shouldBe Seq(ClosedSession(1L, 100, 200, 2, 100))
  }

  test("a post-close event opens a fresh session (state freed on close)") {
    val out = runBatches("tws_reopen", 1800L, "10 minutes")(
      Seq(SessEv(1L, ts(100), 1)),
      Seq(SessEv(99L, ts(50000), 2)), // watermark -> 49400: closes session 1
      Seq(SessEv(1L, ts(60000), 3)), // re-open AFTER close
      Seq(SessEv(99L, ts(200000), 4)),
      Seq(SessEv(99L, ts(200001), 5))) // watermark run to close the re-open
    out.filter(_.user_id == 1L).sortBy(_.session_start) shouldBe Seq(
      ClosedSession(1L, 100, 100, 1, 0),
      ClosedSession(1L, 60000, 60000, 1, 0))
  }

  test("an in-batch gap closes the earlier session eagerly, without a timer") {
    val out = runBatches("tws_eager", 1800L, "10 minutes")(
      Seq(SessEv(1L, ts(100), 1), SessEv(1L, ts(5000), 2)))
    // the second event exceeds the gap within one batch: the first
    // session closes immediately; the second stays open (no watermark
    // has passed its expiry)
    out shouldBe Seq(ClosedSession(1L, 100, 100, 1, 0))
  }

  test("full ordered replay closes every session to exactly the batch rollup") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "event_id AS ord")
      .as[SessEv].collect().sortBy(e => (e.ep, e.ord))
    val cut = evs(evs.length / 2).ep
    val (b1, b2) = evs.partition(_.ep <= cut)
    val maxEp = evs.map(_.ep).max
    // sentinel far past max+gap+watermark so every real session closes
    val sentinel = Seq(SessEv(-1L, ts(maxEp + 1000000L), 0))
    val out = runBatches("tws_replay", 1800L, "10 minutes")(
      b1.toSeq, b2.toSeq, sentinel, Seq(SessEv(-1L, ts(maxEp + 1000001L), 1)))
    val streamed = out.filter(_.user_id >= 0)
      .map(c => (c.user_id, c.session_start, c.session_end, c.n_events))
      .toSet
    // batch columns: user_id, session_seq, n_events, start_sec, end_sec, ...
    val batch = graft.queries.CurationQueries.q_session_stats.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    streamed shouldBe batch
  }
}
