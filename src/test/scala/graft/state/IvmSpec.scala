package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** mergeAdditive must equal a full recompute for every key-presence
  * shape: both sides, base-only, delta-only.
  */
class IvmSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def view(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))

  test("base ⊕ delta == full recompute across key-presence shapes") {
    val baseRows = Seq((1L, 10L), (1L, 20L), (2L, 5L)) // key 2: base-only
    val deltaRows = Seq((1L, 1L), (3L, 7L), (3L, -2L)) // key 3: delta-only
    val merged = Ivm.mergeAdditive(view(baseRows), view(deltaRows),
      keys = Seq("k"), addCols = Seq("n", "s"),
      minCols = Seq("mn"), maxCols = Seq("mx"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val full = view(baseRows ++ deltaRows)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    merged shouldBe full
  }

  test("schema mismatch and unhandled columns are refused") {
    intercept[IllegalArgumentException] {
      Ivm.mergeAdditive(view(Seq((1L, 1L))),
        view(Seq((1L, 1L))).withColumnRenamed("s", "t"),
        keys = Seq("k"), addCols = Seq("n", "s"))
    }
    val e = intercept[IllegalArgumentException] {
      Ivm.mergeAdditive(view(Seq((1L, 1L))), view(Seq((1L, 1L))),
        keys = Seq("k"), addCols = Seq("n", "s"), minCols = Seq("mn"))
    }
    e.getMessage should include("mx")
  }
}
