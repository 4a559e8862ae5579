package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkEntry, SparkSpec}

/** Every declared query must run — not necessarily return rows — against
  * ZERO-ROW copies of all ten tables. Empty inputs are routine at 100 TB
  * (a new tenant, day one of a topic, a filtered branch) and an operator
  * that throws on them fails whole jobs. This pinned five historical
  * crash classes: seeded k-means/PQ inits collecting an empty centroid
  * set (VOID-typed plan literals), kthSmallestBy reading NULL min/max,
  * and the BPE merge list coming up short.
  */
class EmptyInputSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // zero-row frame with the production schema, written as one parquet
      // dir the Tables loader reads like the driver's files
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query runs on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(100)}") }
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }
}
