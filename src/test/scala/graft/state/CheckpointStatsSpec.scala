package graft.state

import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Regression net for the checkpoint stats-carry blowup (r8).
  *
  * `Dataset.localCheckpoint` copies the origin plan's ESTIMATED
  * sizeInBytes into the new leaf, and Catalyst's size-only estimator
  * upper-bounds a join by the product of its children's sizes. An
  * iterative fold that merges (joins) its state and re-checkpoints each
  * round therefore compounds estimates geometrically: the ingest fold
  * measured ×4 BIT-LENGTH growth per tombstone epoch, reaching
  * 41-million-bit BigInts whose multiplication inside every stats visit
  * took over planning (45 s per 30-event epoch).
  * [[GraftSql.localCheckpointMeasuredStats]] replaces the carried
  * estimate with the materialized blocks' real size; these tests pin
  * that the estimate stays BOUNDED under iteration and stays truthful.
  */
class CheckpointStatsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def sizeBits(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  test("iterated merge + measured-stats checkpoint keeps sizeInBytes bounded") {
    var st = GraftSql.localCheckpointMeasuredStats(
      (1 to 64).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    val bits0 = sizeBits(st)
    for (round <- 1 to 8) {
      val updates = st.filter(col("k") % 2 === round % 2)
        .select(col("k"), concat(col("v"), lit("!")).as("v"))
      val merged = Merge.merge(st, updates, Seq("k"))
      st = GraftSql.localCheckpointMeasuredStats(merged)
      // truthful-size contract: a 64-row two-column table can never look
      // larger than 2^40 bytes; the plain-checkpoint carry chain blows
      // past 500 bits by round 8 on this exact loop
      withClue(s"round $round: ") { sizeBits(st) should be < 41 }
    }
    st.count() shouldBe 64
    // and the bound is stable, not merely slowly growing
    sizeBits(st) should be <= bits0 + 8
  }

  test("measured stats reflect the materialized size, not the plan estimate") {
    val big = spark.range(10000).select(col("id").as("k"),
      concat(lit("x"), col("id")).as("v"))
    val joined = big.as("a").join(big.as("b"), "k")
      .select(col("k"), col("a.v").as("v"))
    val ck = GraftSql.localCheckpointMeasuredStats(joined)
    val measured = ck.queryExecution.optimizedPlan.stats.sizeInBytes
    // 10k short rows materialize to somewhere between 10 KiB and 10 MiB;
    // the ESTIMATE for the self-join (product of children) is orders of
    // magnitude beyond that
    measured should be > BigInt(10 * 1024)
    measured should be < BigInt(10L * 1024 * 1024)
    ck.count() shouldBe 10000
  }

  test("empty-input fallback stays finite and positive") {
    val empty = spark.range(0).select(col("id").as("k"))
    val ck = GraftSql.localCheckpointMeasuredStats(empty)
    val s = ck.queryExecution.optimizedPlan.stats.sizeInBytes
    s should be >= BigInt(1)
    s should be <= BigInt(Long.MaxValue)
    ck.count() shouldBe 0
  }
}
