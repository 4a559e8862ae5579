package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.tools.ConcurrencySoak
import java.nio.file.Files

/** Multi-writer soak at suite scale (VERDICT r10 next #4): N threads
  * race mixed full/upsert/delete commits against ONE store root through
  * the real CAS path. FaultInjectionSpec proves single-step crash
  * atomicity; this proves the MULTI-WRITER contract over many rounds —
  * exactly-one-winner per version, a contiguous chain, zero lost
  * updates (final content == serial replay of the winners), and
  * liveness (every thread keeps landing commits; starvation fails
  * loudly inside the soak). The record-scale twin is
  * [[graft.tools.ConcurrencyProbe]] (8×50, hardening record).
  */
class StoreConcurrencySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("4 writers x 16 versions: one winner each, contiguous chain, serial-replay equality") {
    val root = Files.createTempDirectory("graft-conc").toString
    val r = ConcurrencySoak.run(spark, root, threads = 4, targetVersions = 16L)
    // exactly one thread's write() returned success per version — a
    // second "winner" is the silent-lost-update pathology the r11
    // content-signature CAS exists to close
    r.falseSuccesses shouldBe 0
    r.winners.keySet shouldBe (1L to r.versions).toSet
    StateStore.committedVersions(spark, root, Long.MaxValue) shouldBe
      (0L to r.versions)
    // zero lost updates: what the store serves equals the in-memory
    // serial replay of the winning ops in version order
    r.finalRows shouldBe r.replayRows
    // the soak saw real contention (otherwise this proves nothing) and
    // no thread starved (the soak enforces its own liveness bound)
    withClue(s"retry histogram ${r.retryHistogram}: ") {
      r.totalRetries should be > 0
    }
  }

  test("same-version same-bucket-set racers with DIFFERENT content: loser fails retryably") {
    import spark.implicits._
    // the surgical regression leg for the content-signature CAS: two
    // deltas touching the IDENTICAL bucket set at the same version used
    // to produce identical pointer maps, so the loser passed the
    // idempotence check and its data silently vanished
    val root = Files.createTempDirectory("graft-conc").toString
    val spec = TableStore.Spec("t", Seq("k"))
    def frame(v: String) = Seq((1L, v), (2L, v)).toDF("k", "v")
    TableStore.write(spark, root, 0L, Seq(spec), Map("t" -> frame("init")))
    TableStore.write(spark, root, 1L, Seq(spec), Map("t" -> frame("winner")),
      delta = true)
    // same keys -> same touched buckets -> same pointer map; only the
    // content signature can tell this apart from a redelivery
    val ex = intercept[StateStore.ConcurrentWriteException] {
      TableStore.write(spark, root, 1L, Seq(spec), Map("t" -> frame("loser")),
        delta = true)
    }
    ex.getMessage should include("different content")
    // ...while a true byte-identical redelivery still succeeds silently
    TableStore.write(spark, root, 1L, Seq(spec), Map("t" -> frame("winner")),
      delta = true)
    TableStore.read(spark, root, 1L, "t").as[(Long, String)].collect().toMap
      .apply(1L) shouldBe "winner"
  }
}
