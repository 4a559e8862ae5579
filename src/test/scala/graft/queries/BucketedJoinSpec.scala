package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The co-located join contract: storing both sides of a repeated
  * equi-join BUCKETED on the join key (`bucketBy` at write time) lets
  * Spark plan the join with ZERO exchanges — each task reads bucket i of
  * both tables and joins locally. At 100 TB this is the difference
  * between re-shuffling the corpus on every join of a stored view
  * (delta-join maintenance, snapshot⋈snapshot audits, the StateStore's
  * keyed reads) and a shuffle-free merge — the claim appears throughout
  * SURVEY §2's plan notes; this spec makes it a tested invariant rather
  * than a comment.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("bucketed tables equi-join with no exchange; unbucketed twin shuffles") {
    val n = 50000L
    val a = spark.range(n).select(col("id").as("k"), (col("id") * 7 % 1000).as("va"))
    val b = spark.range(n).select(col("id").as("k"), (col("id") * 13 % 1000).as("vb"))
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bj_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bj_b")
    try {
      // broadcast off: the point is the shuffle, not the small-table dodge
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val co = spark.table("bj_a").join(spark.table("bj_b"), "k")
        val coPlan = co.queryExecution.executedPlan.toString
        coPlan should include("SortMergeJoin")
        (coPlan should not).include("Exchange hashpartitioning")
        co.count() shouldBe n

        // the same data joined as plain (unbucketed) scans MUST exchange —
        // proves the bucketed plan's missing shuffle is the bucketing, not
        // some other property of this data
        val pa = spark.table("bj_a").inputFiles.head.replaceAll("/[^/]+$", "")
        val pb = spark.table("bj_b").inputFiles.head.replaceAll("/[^/]+$", "")
        val flat = spark.read.parquet(pa).join(spark.read.parquet(pb), "k")
        flat.queryExecution.executedPlan.toString should
          include("Exchange hashpartitioning")
        flat.count() shouldBe n
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
    }
  }
}
