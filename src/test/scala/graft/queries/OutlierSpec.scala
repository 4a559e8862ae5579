package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkSpec, Tables}

/** q_outlier_events vs an exact BigInt reference: the integer predicate
  * (v*n - S)^2 > 4*(SS*n - S^2) is (v - mu)^2 > 4*sigma^2 multiplied out
  * by n^2, so the flag set must equal a per-key reference computed with
  * arbitrary-precision arithmetic — boundary rows included (a float
  * z-score reference would disagree exactly there).
  */
class OutlierSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("flag set equals the exact BigInt 2-sigma reference; both branches hit") {
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val byUser = raw.groupBy(_._2)
    val expect = raw.filter { case (_, u, v) =>
      val vs = byUser(u).map(t => BigInt(t._3))
      val (n, s, ss) = (BigInt(vs.length), vs.sum, vs.map(x => x * x).sum)
      val dev = BigInt(v) * n - s
      n >= 2 && dev * dev > 4 * (ss * n - s * s)
    }.map(_._1).toSet

    val got = CoreQueries.q_outlier_events.fn(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet

    got shouldBe expect
    got should not be empty                       // some outliers exist
    got.size should be < raw.length               // and most rows pass clean
  }
}
