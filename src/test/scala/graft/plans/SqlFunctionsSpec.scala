package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The SQL face of the native expressions ([[GraftExtensions]]'s
  * injectFunction registrations): a pure `spark.sql(...)` caller must get
  * the same operators the Scala Column API exposes, with static arguments
  * (`nibbles`, `k`) enforced as integer literals at analysis time.
  */
class SqlFunctionsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  test("graft_dot equals the Column-API DotProduct and the manual sum") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("v_dot")
    val sql = spark.sql("SELECT graft_dot(a, b) AS d FROM v_dot")
      .head().getDouble(0)
    val api = df.select(graft.functions.DotProduct(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    sql shouldBe api
    sql shouldBe (4.0 + 10.0 + 18.0) +- 1e-9
  }

  test("graft_int_dot sums products as BIGINT") {
    Seq((Array(1L, 2L), Array(30L, 40L))).toDF("a", "b")
      .createOrReplaceTempView("v_idot")
    spark.sql("SELECT graft_int_dot(a, b) AS d FROM v_idot")
      .head().getLong(0) shouldBe (30L + 80L)
  }

  test("graft_md5_prefix_long equals the Column API and the hex prefix of md5") {
    val df = Seq("the quick brown fox", "").toDF("s")
    df.createOrReplaceTempView("v_md5")
    val sql = spark.sql(
      "SELECT s, graft_md5_prefix_long(s, 15) AS h FROM v_md5 ORDER BY s")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val api = df.select(col("s"), graft.functions.Md5PrefixLong(col("s"), 15).as("h"))
      .orderBy("s").collect().map(r => (r.getString(0), r.getLong(1)))
    sql shouldBe api
    // independent reference: first 15 hex nibbles of the md5 digest
    val expect = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("the quick brown fox").take(15), 16)
    sql.find(_._1 == "the quick brown fox").get._2 shouldBe expect
  }

  test("graft_topk_ordered in GROUP BY SQL matches the row_number window") {
    val df = Seq((1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L),
      (1L, 30.0, 99L), (2L, 5.0, 200L)).toDF("g", "score", "id")
    df.createOrReplaceTempView("v_topk")
    val got = spark.sql(
      """SELECT g, e.pos + 1 AS rn, e.col.score AS score, e.col.id AS id
        |FROM (SELECT g, graft_topk_ordered(score, id, 2) AS top
        |      FROM v_topk GROUP BY g)
        |LATERAL VIEW posexplode(top) e
        |ORDER BY g, rn""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    got shouldBe Array(
      (1L, 1, 30.0, 99L), (1L, 2, 30.0, 101L), (2L, 1, 5.0, 200L))
  }

  test("static arguments must be integer literals, enforced at analysis") {
    Seq(("x", 3)).toDF("s", "n").createOrReplaceTempView("v_lit")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_md5_prefix_long(s, n) FROM v_lit").collect()
    }
    e1.getMessage should include("INTEGER literal")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_dot(s) FROM v_lit").collect()
    }
    e2.getMessage should include("expects 2 arguments")
  }

  test("graft_shingle_hashes / graft_chargram equivalents match the composed SQL forms") {
    Seq((1L, "a b c d"), (2L, "one"), (3L, "x y z x y z"))
      .toDF("id", "text").createOrReplaceTempView("v_sh")
    // word-3-gram: the fused function equals distinct shingle strings
    // hashed through graft_md5_prefix_long, element- and order-exact
    val fused = spark.sql(
      "SELECT id, graft_shingle_hashes(split(text, ' '), 3) AS hs FROM v_sh")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = spark.sql(
      """SELECT id, transform(
        |  array_distinct(CASE WHEN size(split(text,' ')) >= 3 THEN
        |    transform(sequence(1, size(split(text,' ')) - 2),
        |      i -> concat_ws(' ', element_at(split(text,' '), i),
        |        element_at(split(text,' '), i+1), element_at(split(text,' '), i+2)))
        |    ELSE array() END),
        |  x -> graft_md5_prefix_long(x, 15)) AS hs FROM v_sh""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fused shouldBe composed
    fused(2L) shouldBe Seq.empty // under 3 tokens: empty, not null
  }
}
