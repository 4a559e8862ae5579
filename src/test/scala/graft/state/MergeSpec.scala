package graft.state

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.state.Merge.MergeCols
import java.sql.Timestamp

class MergeSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("merge inserts unmatched updates, keeps target-only rows, resolves matches") {
    val target = Seq(("a", 1, "old"), ("b", 2, "keep")).toDF("k", "v", "tag")
    val updates = Seq(("a", 10, "new"), ("c", 30, "ins")).toDF("k", "v", "tag")
    val out = Merge.merge(target, updates, Seq("k"), Map(
      "v" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
      .orderBy("k").as[(String, Int, String)].collect()
    out shouldBe Array(
      ("a", 10, "old"), // matched: v resolved to update, tag default keeps existing
      ("b", 2, "keep"), // target-only carried
      ("c", 30, "ins")) // inserted
  }

  test("a resolver for a non-existent column is rejected, not silently ignored") {
    val target = Seq(("a", 1)).toDF("k", "v")
    val updates = Seq(("a", 10)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      Merge.merge(target, updates, Seq("k"), Map(
        "vv" -> ((c: MergeCols) => c.update)))) // typo for "v"
    e.getMessage should include("vv")
  }

  test("update-only merge drops unmatched update rows (no inserts)") {
    val target = Seq(("a", 1)).toDF("k", "v")
    val updates = Seq(("a", 10), ("zz", 99)).toDF("k", "v")
    val out = Merge.mergeUpdateOnly(target, updates, Seq("k"), Map(
      "v" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
      .orderBy("k").as[(String, Int)].collect()
    out shouldBe Array(("a", 10)) // zz NOT inserted
  }

  test("expireOwns is a no-op for a (team, asset) with no existing edge — no phantom active edge") {
    // reference main.go:306-317 iterates EXISTING owner edges only; a
    // tombstone for a team that never owned the asset must not create an
    // edge (round-1 bug: full-outer merge inserted a null-start, null-end
    // — i.e. ACTIVE — phantom edge that kept the asset alive forever)
    val owns = Seq(
      ("T1~a1", "T1", "a1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("id", "team_id", "asset_id", "start_time", "end_time")
    val toExpire = Seq(("T2", "a1")).toDF("team_id", "asset_id")
    val out = Upserts.expireOwns(owns, toExpire, lit(ts("2024-06-01 00:00:00")))
    out.count() shouldBe 1
    val row = out.collect()(0)
    row.getAs[String]("team_id") shouldBe "T1"
    row.getAs[Timestamp]("end_time") shouldBe null // untouched, still active
  }

  test("expireOwns ends the matching edge and preserves start_time") {
    val owns = Seq(
      ("T1~a1", "T1", "a1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      ("T2~a1", "T2", "a1", ts("2024-02-01 00:00:00"), None: Option[Timestamp]))
      .toDF("id", "team_id", "asset_id", "start_time", "end_time")
    val toExpire = Seq(("T1", "a1")).toDF("team_id", "asset_id")
    val now = ts("2024-06-01 00:00:00")
    val out = Upserts.expireOwns(owns, toExpire, lit(now))
      .orderBy("team_id").collect()
    out(0).getAs[Timestamp]("end_time") shouldBe now
    out(0).getAs[Timestamp]("start_time") shouldBe ts("2024-01-01 00:00:00")
    out(1).getAs[Timestamp]("end_time") shouldBe null
  }

  test("duplicateKeys flags keys with >1 row") {
    val df = Seq("a", "a", "b").toDF("k")
    val dups = Merge.duplicateKeys(df, Seq("k")).as[(String, Long)].collect()
    dups shouldBe Array(("a", 2L))
  }
}
