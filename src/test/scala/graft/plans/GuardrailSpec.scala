package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The guardrail extension end-to-end on the shared session (GraftSession
  * wires GraftExtensions into every builder): mode off/warn pass, fail
  * raises at plan time for the two flagged shapes, and the deliberate
  * small-side patterns the engine itself uses stay exempt.
  */
class GuardrailSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def withMode[A](mode: String)(f: => A): A = {
    spark.conf.set(Guardrails.ConfKey, mode)
    try f finally spark.conf.unset(Guardrails.ConfKey)
  }

  private def bigCross = {
    val n = 100000L
    spark.range(n).toDF("x").crossJoin(spark.range(n).toDF("y"))
  }

  private def globalWindow = {
    import org.apache.spark.sql.expressions.Window
    spark.range(100000).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
  }

  test("fail mode raises at plan time on an unbounded cartesian") {
    val e = intercept[SparkException](withMode("fail") {
      bigCross.queryExecution.optimizedPlan
    })
    e.getMessage should include("cross join")
  }

  test("fail mode raises on a global window over a large input") {
    val e = intercept[SparkException](withMode("fail") {
      globalWindow.queryExecution.optimizedPlan
    })
    e.getMessage should include("partitionBy")
  }

  test("warn and off modes never block; the default is warn (r8: on out of the box)") {
    withMode("warn") { bigCross.queryExecution.optimizedPlan }
    withMode("off") { globalWindow.queryExecution.optimizedPlan }
    // no conf set at all: the default must WARN (log, never block) —
    // user pipelines get cartesian/global-window protection by default
    spark.conf.unset(Guardrails.ConfKey)
    bigCross.queryExecution.optimizedPlan
    succeed
  }

  test("an explicit broadcast() hint exempts a cross join (the caller's smallness assertion)") {
    withMode("fail") {
      // neither side provably small to the planner, but the broadcast
      // hint asserts it — the engine's own IVF probe shape
      val cents = spark.range(100000).toDF("x").filter(col("x") % 7 === 0)
      spark.range(100000).toDF("y").crossJoin(broadcast(cents))
        .queryExecution.optimizedPlan
    }
    succeed
  }

  test("every declared catalog query plans clean under fail mode") {
    // the default-warn flip is safe BECAUSE the whole catalog is
    // guardrail-clean — proven here at plan time, not argued: any new
    // query that sneaks in a cartesian or an unpartitioned window over
    // possibly-large input fails this test before it ships
    val dir = "/root/testdata/sf0.001"
    withMode("fail") {
      for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
        withClue(s"$name: ") {
          noException should be thrownBy fn(spark, dir).queryExecution.optimizedPlan
        }
      }
    }
  }

  test("provably small sides are exempt: the engine's scalar-broadcast pattern") {
    withMode("fail") {
      // one-row aggregate cross-joined into a big frame — the ppm
      // denominator shape used across the catalog
      val total = spark.range(100000).toDF("x").agg(sum(col("x")).as("t"))
      spark.range(100000).toDF("x").crossJoin(broadcast(total))
        .queryExecution.optimizedPlan
      // both sides literally tiny
      spark.range(3).toDF("a").crossJoin(spark.range(5).toDF("b"))
        .queryExecution.optimizedPlan
    }
    succeed
  }

  test("a declared catalog query plans clean under fail mode") {
    withMode("fail") {
      graft.queries.CoreQueries.q1_agg.fn(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
    }
    succeed
  }
}
