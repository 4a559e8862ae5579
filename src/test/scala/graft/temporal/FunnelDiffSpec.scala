package graft.temporal

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Semantics the oracle gate can't see for the D5 as-of diff and the D6
  * funnel: liveness edge cases, ordering ties, window expiry, first-touch
  * stalling.
  */
class FunnelDiffSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- asOfDiff -------------------------------------------------------------

  private val t1 = lit(ts("2024-01-10 00:00:00"))
  private val t2 = lit(ts("2024-01-20 00:00:00"))

  private def diffOf(rows: Seq[(String, Timestamp, Option[Timestamp])]) =
    Temporal.asOfDiff(rows.toDF("id", "s", "e"), "s", "e", t1, t2)
      .select("id", "change").as[(String, String)].collect().toMap

  test("asOfDiff labels added/removed and drops unchanged rows") {
    val got = diffOf(Seq(
      ("added", ts("2024-01-15 00:00:00"), None), // starts between
      ("removed", ts("2024-01-01 00:00:00"), Some(ts("2024-01-12 00:00:00"))),
      ("live_both", ts("2024-01-01 00:00:00"), None), // unchanged
      ("dead_both", ts("2024-01-01 00:00:00"), Some(ts("2024-01-05 00:00:00"))),
      ("never", ts("2024-02-01 00:00:00"), None))) // starts after both
    got shouldBe Map("added" -> "added", "removed" -> "removed")
  }

  test("asOfDiff boundary: end exactly at T means not alive at T") {
    // end > T is the liveness condition (owns-edge convention), so an edge
    // ending exactly at t2 counts as removed; one starting exactly at t2
    // counts as added (start <= T)
    val got = diffOf(Seq(
      ("ends_at_t2", ts("2024-01-01 00:00:00"), Some(ts("2024-01-20 00:00:00"))),
      ("starts_at_t2", ts("2024-01-20 00:00:00"), None)))
    got shouldBe Map("ends_at_t2" -> "removed", "starts_at_t2" -> "added")
  }

  test("property: asOfDiff equals the model on random intervals") {
    val rnd = new scala.util.Random(77)
    def t0 = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 500).map { i =>
      val start = new Timestamp(t0 + rnd.nextInt(30) * 86400000L)
      val end = if (rnd.nextBoolean()) None
        else Some(new Timestamp(start.getTime + (1 + rnd.nextInt(30)) * 86400000L))
      (s"r$i", start, end)
    }
    def alive(s: Timestamp, e: Option[Timestamp], at: Timestamp) =
      !s.after(at) && e.forall(_.after(at))
    val at1 = ts("2024-01-10 00:00:00"); val at2 = ts("2024-01-20 00:00:00")
    val expect = rows.flatMap { case (id, s, e) =>
      (alive(s, e, at1), alive(s, e, at2)) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        case _ => None
      }
    }.toMap
    expect.values.toSet shouldBe Set("added", "removed") // both classes generated
    diffOf(rows.map { case (id, s, e) => (id, s, e) }) shouldBe expect
  }

  // --- funnel ---------------------------------------------------------------

  private def funnelOf(rows: Seq[(Int, String, Long, String)]) =
    Temporal.funnel(
      rows.toDF("u", "et", "off", "eid")
        .withColumn("ts", timestamp_seconds(col("off"))),
      key = "u", ts = "ts", ord = "eid", et = "et",
      steps = Seq("view", "click", "purchase"), windowSecs = 100L)
      .select("u", "stage", "last_step_epoch")
      .as[(Int, Int, Option[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("funnel walks steps in order within the window") {
    val got = funnelOf(Seq(
      (1, "view", 10L, "a"), (1, "click", 50L, "b"), (1, "purchase", 120L, "c"),
      (2, "view", 10L, "a"), (2, "click", 50L, "b"), // no purchase
      (3, "click", 10L, "a"), (3, "view", 20L, "b"), // click BEFORE view: ignored
      (4, "signup", 10L, "a"))) // never opens
    got(1) shouldBe ((3, Some(120L)))
    got(2) shouldBe ((2, Some(50L)))
    got(3) shouldBe ((1, Some(20L)))
    got(4) shouldBe ((0, None))
  }

  test("an over-cap key fails loudly with the key in the message, not an OOM") {
    val rows = (1 to 10).map(i => (7, "view", i.toLong, s"e$i")) ++
      Seq((8, "view", 1L, "x")) // healthy key
    val df = rows.toDF("u", "et", "off", "eid")
      .withColumn("ts", timestamp_seconds(col("off")))
    val ex = intercept[Exception] {
      Temporal.funnel(df, "u", "ts", "eid", "et",
        steps = Seq("view"), windowSecs = 100L, maxEventsPerKey = 5)
        .collect()
    }
    // Spark wraps the raise_error in a SparkRuntimeException chain;
    // the user message must surface the offending key and the cap
    val msg = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    msg should include("funnel key 7")
    msg should include("maxEventsPerKey=5")
    // the default cap leaves the healthy path untouched
    Temporal.funnel(df, "u", "ts", "eid", "et",
      steps = Seq("view"), windowSecs = 100L).count() shouldBe 2
  }

  test("funnel window expiry stalls for good (first-touch, no restart)") {
    val got = funnelOf(Seq(
      // click arrives 150s after the view (window 100) -> stalls at 1;
      // the later view does NOT restart the funnel
      (1, "view", 10L, "a"), (1, "click", 160L, "b"),
      (1, "view", 200L, "c"), (1, "click", 210L, "d"),
      // boundary: click at exactly view+window still converts
      (2, "view", 10L, "a"), (2, "click", 110L, "b")))
    got(1) shouldBe ((1, Some(10L)))
    got(2) shouldBe ((2, Some(110L)))
  }

  test("funnel same-second ties resolve by ord, not input order") {
    // both events in the same second; eid order says view first
    val got = funnelOf(Seq(
      (1, "click", 10L, "b"), (1, "view", 10L, "a"),
      // and the reverse labeling on user 2: click sorts first, is ignored
      (2, "view", 10L, "b"), (2, "click", 10L, "a")))
    got(1) shouldBe ((2, Some(10L))) // view(a) then click(b) same second
    got(2) shouldBe ((1, Some(10L))) // click(a) ignored, view(b) opens
  }

  test("funnel window gates on the PREVIOUS step's time, not the first") {
    val got = funnelOf(Seq(
      // view@10, click@100 (within 100), purchase@190 (within 100 of the
      // CLICK but 180 after the view) -> must complete
      (1, "view", 10L, "a"), (1, "click", 100L, "b"), (1, "purchase", 190L, "c")))
    got(1) shouldBe ((3, Some(190L)))
  }

  test("property: funnel equals a driver-side reference fold on random streams") {
    // independent Scala model of the first-touch fold, diffed against the
    // distributed sorted-array implementation over generated event logs —
    // the funnel analog of the scalar-census property tests
    val steps = Seq("view", "click", "purchase")
    def reference(evs: Seq[(Long, String)], window: Long): (Int, Option[Long]) = {
      // evs already (epoch, type) in (epoch, ord) order
      var stage = 0; var ep = 0L
      for ((e, t) <- evs)
        if (stage < steps.length && t == steps(stage) &&
          (stage == 0 || e <= ep + window)) { stage += 1; ep = e }
      (stage, if (stage > 0) Some(ep) else None)
    }
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rnd = new scala.util.Random(1234)
    val rows = for {
      u <- 1 to 60
      n = rnd.nextInt(25)
      i <- 0 until n
    } yield (u, types(rnd.nextInt(types.length)),
      rnd.nextInt(500).toLong, f"e$i%03d")
    val window = 37L
    val got = Temporal.funnel(
      rows.toDF("u", "et", "off", "eid")
        .withColumn("ts", timestamp_seconds(col("off"))),
      key = "u", ts = "ts", ord = "eid", et = "et",
      steps = steps, windowSecs = window)
      .select("u", "stage", "last_step_epoch")
      .as[(Int, Int, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expect = rows.groupBy(_._1).map { case (u, g) =>
      u -> reference(
        g.sortBy(e => (e._3, e._4)).map(e => (e._3, e._2)), window)
    }
    // users with zero events don't appear in either
    got.keySet shouldBe expect.keySet
    expect.foreach { case (u, e) => got(u) shouldBe e }
  }
}
