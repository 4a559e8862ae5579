package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkEntry, SparkSpec}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-serving correctness: the engine is one shared
  * SparkSession serving many callers (the bench's warm pass, a REST
  * facade, notebook users), so concurrent executions of the SAME
  * catalog must return exactly what sequential executions return —
  * racing SessionCache builds, shared materialized frames, SQL temp
  * views and in-query store writers included. The bench exercises this
  * load shape but never CHECKS the results; this suite does.
  */
class ConcurrentCatalogSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  /** Order-insensitive result fingerprint. */
  private def fp(name: String, d: String): Seq[String] =
    SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq.sorted

  /** A cross-family sample: shared token frame (text), shared shingle
    * frame (dedup), shared embedding index (similarity), shared synth
    * snapshot (graph), the SQL temp-view path, and an in-query store
    * writer.
    */
  private val sample = Seq(
    "q_tfidf_topterms", "q_cooccur_assoc", "q_dedup_stats",
    "q_similarity_topk", "q_parents_join", "q_sql_topk",
    "q_topk_per_group", "q_token_count")

  test("concurrent executions return the sequential results, two rounds") {
    val baseline = sample.map(n => n -> fp(n, dir)).toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = Await.result(
        Future.sequence((sample ++ sample).map { n =>
          Future(n -> fp(n, dir))
        }), 10.minutes)
      for ((n, rows) <- runs)
        withClue(s"$n under concurrency: ") { rows shouldBe baseline(n) }
    } finally pool.shutdown()
  }

  test("the SQL temp-view path cannot cross-serve two dirs racing") {
    val dirB = "/root/testdata/sf0.01"
    val a = fp("q_sql_topk", dir)
    val b = fp("q_sql_topk", dirB)
    a should not be b // distinct corpora — a cross-serve would be visible
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = Await.result(
        Future.sequence((1 to 12).map { i =>
          val d = if (i % 2 == 0) dir else dirB
          Future((d, fp("q_sql_topk", d)))
        }), 10.minutes)
      for ((d, rows) <- runs)
        rows shouldBe (if (d == dir) a else b)
    } finally pool.shutdown()
  }
}
