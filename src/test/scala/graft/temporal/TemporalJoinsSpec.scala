package graft.temporal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Differential tests for the equi-ized temporal joins: the bucketed
  * range join must equal the naive inequality join, and the union+carry
  * as-of join must equal a per-point linear reference — on randomized
  * data with adversarial bucket-boundary alignment.
  */
class TemporalJoinsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  private def ts(micros: Long) =
    new java.sql.Timestamp(micros / 1000) // micros → millis (sub-milli zeroed)

  // random instants across ~3 days, many landing EXACTLY on cell edges
  private def instant(): Long = {
    val base = 1700000000000000L
    val w = 15L * 60 * 1000000
    if (rnd.nextBoolean()) base + rnd.nextInt(300) * w // on-grid
    else base + (rnd.nextDouble() * 300 * w).toLong
  }

  test("pointInInterval == naive inequality join on random data") {
    val points = Seq.tabulate(400)(i => (i.toLong, ts(instant())))
      .toDF("pid", "pt")
    val ivs = Seq.tabulate(60) { i =>
      val s = instant()
      // spans from zero-width (dropped) to multi-cell
      (i.toLong, ts(s), ts(s + (rnd.nextDouble() * 4 * 15 * 60 * 1000000).toLong))
    }.toDF("iid", "ws", "we")

    val fast = TemporalJoins.pointInInterval(points, "pt", ivs, "ws", "we")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("pt") >= col("ws") && col("pt") < col("we"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    fast shouldBe naive
    naive should not be empty
  }

  test("pointInInterval: no duplicate pairs, nulls never match, empty intervals dropped") {
    val points = Seq((1L, ts(1700000000000000L)), (2L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("pid", "pt")
    val ivs = Seq(
      (10L, ts(1700000000000000L), ts(1700000000000000L)), // empty: start == end
      (11L, ts(1699999999000000L), ts(1700000001000000L)))
      .toDF("iid", "ws", "we")
    val out = TemporalJoins.pointInInterval(points, "pt", ivs, "ws", "we")
      .select("pid", "iid").as[(Long, Long)].collect()
    out.toSeq shouldBe Seq((1L, 11L)) // exactly once, null point absent
  }

  test("pointInInterval refuses an interval wider than the cell cap") {
    val points = Seq((1L, ts(1700000000000000L))).toDF("pid", "pt")
    val wide = Seq((1L, ts(0L), ts(1700000000000000L))).toDF("iid", "ws", "we")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.pointInInterval(points, "pt", wide, "ws", "we",
        maxBucketsPerInterval = 16)
    }
    e.getMessage should include("cells > cap")
  }

  test("asOfJoin == per-point linear reference, ties take the at-instant update") {
    val updates = Seq.tabulate(80) { i =>
      (i.toLong % 5, ts(instant()), i.toLong * 10)
    }.toDF("k", "uts", "payload")
      // precondition: unique (key, time)
      .groupBy("k", "uts").agg(max("payload").as("payload"))
    val points = Seq.tabulate(200)(i => (i.toLong, i.toLong % 7, ts(instant())))
      .toDF("pid", "k", "pts")

    val got = TemporalJoins.asOfJoin(points, "pts", updates, "uts",
      keys = Seq("k"), payloadCols = Seq("payload", "uts"))
      .select("pid", "payload", "uts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

    val us = updates.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val want = points.collect().map { r =>
      val (pid, k, pts) = (r.getLong(0), r.getLong(1), r.getTimestamp(2))
      val prior = us.filter(u => u._1 == k && !u._2.after(pts))
      if (prior.isEmpty) (pid, None, None)
      else {
        val best = prior.maxBy(_._2.getTime)
        (pid, Some(best._3), Some(best._2))
      }
    }.toSet
    got shouldBe want
  }

  test("asOfJoin keeps every point exactly once (left semantics)") {
    val updates = Seq((99L, ts(1700000000000000L), 1L)).toDF("k", "uts", "payload")
    val points = Seq.tabulate(50)(i => (i.toLong, i.toLong % 3, ts(instant())))
      .toDF("pid", "k", "pts")
    val out = TemporalJoins.asOfJoin(points, "pts", updates, "uts",
      keys = Seq("k"), payloadCols = Seq("payload"))
    out.count() shouldBe 50
    out.filter(col("payload").isNotNull).count() shouldBe 0 // no key overlap
    out.columns.toSeq shouldBe Seq("pid", "k", "pts", "payload")
  }
}
