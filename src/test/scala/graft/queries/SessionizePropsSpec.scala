package graft.queries

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Property test for the sessionize window pair (D21/D23): the two-window
  * Spark plan is checked against an independent sequential fold over
  * generated event streams — random users, clustered AND adversarial
  * gaps (exactly 1800 s sits on the boundary: NOT a break; 1801 s is).
  */
class SessionizePropsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val eventsGen: Gen[List[(Long, Long)]] = {
    val ev = for {
      user <- Gen.choose(1L, 8L)
      // mix sub-gap steps, exact-boundary steps, and clear breaks
      sec <- Gen.oneOf(Gen.choose(0L, 3600L), Gen.oneOf(0L, 1800L, 1801L, 5400L),
        Gen.choose(0L, 200000L))
    } yield (user, sec)
    Gen.listOfN(400, ev)
  }

  private def model(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    rows.groupBy(_._2).flatMap { case (_, es) =>
      var seq = 0L
      var last = Long.MinValue
      es.sortBy(e => (e._3, e._1)).map { case (id, _, sec) =>
        if (seq == 0L || sec - last > 1800L) seq += 1
        last = sec
        id -> seq
      }
    }

  test("sessionize equals a sequential fold on generated streams, boundary included") {
    val raw = eventsGen.sample.get.zipWithIndex
      .map { case ((u, s), i) => (i.toLong, u, s) }
    val df = raw.toDF("event_id", "user_id", "sec")
    // same window pair as q_sessionize, applied to the generated frame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val got = df
      .withColumn("brk",
        when(lag(col("sec"), 1).over(w).isNull
          || col("sec") - lag(col("sec"), 1).over(w) > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(w))
      .select(col("event_id"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe model(raw)
    // boundary sanity: the generator really produced both regimes
    got.values.max should be > 1L
  }
}
