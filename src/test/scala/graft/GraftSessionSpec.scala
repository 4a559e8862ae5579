package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The canonical session config must actually be live in every harness
  * session — a silently-dropped flag here would shift temporal results
  * (timeZone), break nanosecond parquet scans, or un-pin the AQE/pushdown
  * behavior the operators' scale design assumes.
  */
class GraftSessionSpec extends AnyFunSuite with SparkSpec with Matchers {
  test("canonical engine config is live in the shared session") {
    spark.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
    spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") shouldBe "true"
    spark.conf.get("spark.sql.adaptive.enabled") shouldBe "true"
    spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") shouldBe "true"
    spark.conf.get("spark.sql.adaptive.skewJoin.enabled") shouldBe "true"
    spark.conf.get("spark.sql.parquet.filterPushdown") shouldBe "true"
  }
}
