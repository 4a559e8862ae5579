package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Streaming maintenance of the persisted IVF index
  * ([[VectorIndex.maintainStream]]): a vector CDC feed keeps the stored
  * assignment equal to assigning the NET corpus under the frozen
  * training-time centroids after every micro-batch — upserts, replaces
  * and retractions included — and an at-least-once replayed batch
  * recommits its version idempotently against the same centroids.
  */
case class VecEvent(vec_id: Long, v: Seq[Float], op: String, seq: Long)

class StreamVecIndexSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  // must match Similarity.Dim — the k-means update's zero accumulator is
  // engine-dimension-typed, so shorter test vectors null-pad the zip_with
  private val Dim = 64

  private def vecOf(i: Long, c: Int): Seq[Float] =
    (0 until Dim).map { d =>
      val base = if (d % 4 == c) 10.0f else 1.0f
      base + ((i * 31 + d * 7) % 5) * 0.1f
    }

  private def withNrm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(aggregate(
      transform(col("v"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, x) => a + x)))

  private def embOf(rows: (Long, Seq[Float])*): DataFrame =
    withNrm(rows.toDF("vec_id", "v"))

  private def asgMap(df: DataFrame): Map[Long, Long] =
    df.select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap

  private def events(df: DataFrame): DataFrame = withNrm(df)

  test("vector CDC feed: upsert, replace, delete all reach the stored assignment") {
    val root = Files.createTempDirectory("graft_streamvec").toString
    val ckpt = Files.createTempDirectory("graft_streamvec_ckpt").toString
    val base = embOf((0L until 40L).map(i => i -> vecOf(i, (i % 4).toInt)): _*)
    VectorIndex.trainIvf(spark, root, base) // v0
    VectorIndex.trainPq(spark, root, base) // PQ twin maintained in the same feed
    VectorIndex.trainIvfPq(spark, root, base) // IVFADC twin too (r11)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[VecEvent]
    val q = VectorIndex.maintainStream(
      events(src.toDF()), root, ckpt)
    try {
      // batch 0: two arrivals; batch 1: one replace (vec 5 moves
      // cluster), one retraction (vec 7), one arrival whose in-batch
      // history ends deleted
      src.addData(
        VecEvent(40L, vecOf(40L, 0), "upsert", 1L),
        VecEvent(41L, vecOf(41L, 1), "upsert", 2L))
      q.processAllAvailable()
      src.addData(
        VecEvent(5L, vecOf(5L, 2), "upsert", 10L),
        VecEvent(7L, Seq.fill(Dim)(0f), "delete", 10L),
        VecEvent(42L, vecOf(42L, 3), "upsert", 10L),
        VecEvent(42L, Seq.fill(Dim)(0f), "delete", 11L))
      q.processAllAvailable()
    } finally q.stop()

    // net corpus under the FROZEN training centroids
    val net = embOf(
      ((0L until 40L).filterNot(_ == 5L).filterNot(_ == 7L)
        .map(i => i -> vecOf(i, (i % 4).toInt)) ++
        Seq(5L -> vecOf(5L, 2), 40L -> vecOf(40L, 0), 41L -> vecOf(41L, 1))): _*)
    val cents = VectorIndex.ivfCentroids(spark, root)
    asgMap(VectorIndex.ivfAssignments(spark, root)) shouldBe
      asgMap(Similarity.assignCells(net, cents))
    // the PQ code table tracked the same feed under its frozen codebooks
    val books = VectorIndex.pqBooks(spark, root)
    VectorIndex.pqCodes(spark, root).collect().map(_.toString).sorted shouldBe
      Pq.codesOf(net, books).collect().map(_.toString).sorted
    // ...and the IVFADC cell-carrying code table did too: net corpus
    // residual-coded under the frozen quantizer + frozen residual books
    val ivfPqBooks = VectorIndex.ivfPqBooks(spark, root)
    VectorIndex.ivfPqCodes(spark, root).collect().map(_.toString).sorted shouldBe
      Pq.codesOf(VectorIndex.residualsOf(net, cents), ivfPqBooks,
        carry = Seq("cell")).collect().map(_.toString).sorted
  }

  test("an at-least-once replayed batch recommits against the same frozen centroids") {
    val root = Files.createTempDirectory("graft_streamvec").toString
    val base = embOf((0L until 20L).map(i => i -> vecOf(i, (i % 4).toInt)): _*)
    VectorIndex.trainIvf(spark, root, base)
    val b0 = events(Seq(
      VecEvent(20L, vecOf(20L, 1), "upsert", 1L),
      VecEvent(3L, Seq.fill(Dim)(0f), "delete", 2L)).toDF())
    VectorIndex.foldVecBatch(spark, root, b0, 0L)
    val after = asgMap(VectorIndex.ivfAssignments(spark, root))
    noException should be thrownBy VectorIndex.foldVecBatch(spark, root, b0, 0L)
    VectorIndex.latestIvf(spark, root) shouldBe 1L
    asgMap(VectorIndex.ivfAssignments(spark, root)) shouldBe after
    after.keySet should not contain 3L
    after.keySet should contain(20L)
  }

  test("streaming against an untrained root fails loudly (no train-from-empty)") {
    val root = Files.createTempDirectory("graft_streamvec").toString
    val b = events(Seq(VecEvent(1L, vecOf(1L, 0), "upsert", 1L)).toDF())
    intercept[IllegalStateException] {
      VectorIndex.foldVecBatch(spark, root, b, 0L)
    }.getMessage should include("trainIvf")
  }
}
