package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Property test for the integer-lattice A-ES sampler core (H57): the
  * distributed Window + Md5PrefixLong pipeline must select EXACTLY the
  * rows an independent JVM fold selects — same md5 prefix, same integral
  * division, same (priority, id) tiebreak — over generated corpora with
  * adversarial weights (1, equal ties, huge spreads). Determinism IS the
  * operator's contract: any divergence between engines or between runs
  * silently changes a training corpus.
  */
class WeightedSamplePropsSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val K = 5

  private val corpusGen: Gen[List[(Long, String, Long)]] = {
    val doc = for {
      id <- Gen.choose(0L, 100000L)
      stratum <- Gen.oneOf("a", "b", "c")
      w <- Gen.oneOf(Gen.const(1L), Gen.const(64L), Gen.choose(1L, 7L),
        Gen.choose(1L, 1000000L))
    } yield (id, stratum, w)
    Gen.listOfN(300, doc).map(_.distinctBy(_._1))
  }

  /** Reference fold: same derivation, plain Scala. */
  private def model(rows: Seq[(Long, String, Long)]): Set[Long] =
    rows.filter(_._3 >= 1).groupBy(_._2).flatMap { case (_, ds) =>
      ds.map { case (id, _, w) =>
        val pk = java.lang.Long.parseLong(
          graft.ext.TextAnalysis.md5hexJvm(s"ws|$id").substring(0, 15), 16)
        (pk / w, id)
      }.sortBy(identity).take(K).map(_._2)
    }.toSet

  test("distributed sampler selects exactly the reference fold's rows") {
    (1 to 3).foreach { _ =>
      val rows = corpusGen.sample.get
      val df = rows.toDF("doc_id", "source", "n_chars")
      val got = df.filter(col("n_chars") >= 1)
        .withColumn("pk", graft.functions.Md5PrefixLong(
          concat(lit("ws|"), col("doc_id").cast("string")), 15))
        .withColumn("priority", expr("pk div n_chars"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("priority"), col("doc_id"))))
        .filter(col("rnk") <= K)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      got shouldBe model(rows)
    }
  }
}
