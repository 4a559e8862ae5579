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

  test("joinDelta == full join across all four old×new quadrants") {
    // splits chosen so every quadrant has matches: key 1 old×old,
    // key 2 old-A×new-B, key 3 new-A×old-B, key 4 new-A×new-B,
    // key 5 never matches (A-only), key 6 B-only — inner join drops both
    val aOld = Seq((1L, "a1"), (2L, "a2"), (5L, "a5")).toDF("k", "av")
    val dA = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
    val bOld = Seq((1L, 10L), (3L, 30L)).toDF("k", "bv")
    val dB = Seq((2L, 20L), (4L, 40L), (6L, 60L)).toDF("k", "bv")

    val viewOld = aOld.join(bOld, Seq("k"))
    val maintained = Ivm.joinDelta(viewOld, aOld, dA,
      bOld.unionByName(dB), dB, Seq("k"))
      .as[(Long, String, Long)].collect().sorted
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
      .as[(Long, String, Long)].collect().sorted
    maintained shouldBe full
    // the ΔA⋈ΔB cross-term (key 4) appears exactly once, not twice
    maintained.count(_._1 == 4L) shouldBe 1
  }

  test("property: joinDelta == full join on random multisets and splits") {
    // duplicate keys on both sides (join fan-out) and random row-level
    // splits — the maintenance rule must hold for any batch boundary
    val rnd = new scala.util.Random(20260813L)
    (1 to 6).foreach { _ =>
      val aRows = (1 to 40).map(i => (rnd.nextInt(12).toLong, s"a$i"))
      val bRows = (1 to 40).map(i => (rnd.nextInt(12).toLong, i.toLong))
      val (aOldR, dAR) = aRows.partition(_ => rnd.nextBoolean())
      val (bOldR, dBR) = bRows.partition(_ => rnd.nextBoolean())
      val (aOld, dA) = (aOldR.toDF("k", "av"), dAR.toDF("k", "av"))
      val (bOld, dB) = (bOldR.toDF("k", "bv"), dBR.toDF("k", "bv"))
      val maintained = Ivm.joinDelta(aOld.join(bOld, Seq("k")), aOld, dA,
        bOld.unionByName(dB), dB, Seq("k"))
        .as[(Long, String, Long)].collect().sorted
      val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
        .as[(Long, String, Long)].collect().sorted
      maintained shouldBe full
    }
  }
}
