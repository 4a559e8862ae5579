package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench's materialization contamination boundary (VERDICT r7 #7):
  * Bench snapshots [[Materialize.timings]] before its per-query timing
  * loop and asserts no index build executed inside it — proven here at
  * the unit level so the guard itself cannot silently rot.
  */
class MaterializeSpec extends AnyFunSuite with Matchers {

  test("timed accumulates per-name spans across calls") {
    val before = Materialize.timings.getOrElse("spec_accum_build", 0.0)
    Materialize.timed("spec_accum_build") { Thread.sleep(3) }
    Materialize.timed("spec_accum_build") { Thread.sleep(3) }
    Materialize.timings("spec_accum_build") should be >= (before + 0.005)
  }

  test("assertNoBuildsSince: clean region passes, a build inside the region fails loudly") {
    val before = Materialize.timings
    Materialize.assertNoBuildsSince(before, "a build-free region")
    Materialize.timed("spec_probe_build") { Thread.sleep(2) }
    val e = intercept[IllegalArgumentException] {
      Materialize.assertNoBuildsSince(before, "the spec's timed region")
    }
    e.getMessage should include("spec_probe_build")
    e.getMessage should include("the spec's timed region")
    // a snapshot taken AFTER the build marks the new boundary
    Materialize.assertNoBuildsSince(Materialize.timings, "after re-snapshot")
  }

  test("queryBuild records one span PER INVOCATION (not a sum) and reset clears") {
    Materialize.resetQueryBuilds()
    Materialize.queryBuild("spec_lifecycle_q") { Thread.sleep(2) }
    Materialize.queryBuild("spec_lifecycle_q") { Thread.sleep(2) }
    val spans = Materialize.queryBuildSpans("spec_lifecycle_q")
    // Bench medians the per-run spans, so each run must stay its own entry
    spans should have size 2
    all(spans) should be >= 0.002
    // the value flows through even when the build throws? no — a failed
    // build records nothing (the query is failing anyway) and rethrows
    intercept[RuntimeException] {
      Materialize.queryBuild("spec_lifecycle_fail") { throw new RuntimeException("x") }
    }
    Materialize.queryBuildSpans.get("spec_lifecycle_fail") shouldBe None
    // queryBuildTotal: the cumulative sum Bench deltas around each timed
    // run (per-run build = total-after - total-before, exact whatever
    // number of builds a run performs); zero for an unknown query
    Materialize.queryBuildTotal("spec_lifecycle_q") shouldBe
      Materialize.queryBuildSpans("spec_lifecycle_q").sum
    Materialize.queryBuildTotal("never_built") shouldBe 0.0
    Materialize.resetQueryBuilds()
    Materialize.queryBuildSpans shouldBe empty
  }
}
