package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Streaming embedding near-dedup semantics, mirroring StreamDedupSpec:
  * cross-batch near-dup vectors surface in the completing batch, each
  * pair once, redelivery cannot duplicate index rows or pairs, and the
  * accumulated-index read prunes to the batch's partitions.
  */
case class Vec(vec_id: Long, embedding: Array[Float])

class StreamVecDedupSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val Planes = 4
  private val Tau = 0.95

  /** Deterministic unit-ish vectors: `near` tilts `base` slightly
    * (cosine ~0.999), `far` is axis-orthogonal (cosine ~0).
    */
  private def unit(axis: Int): Array[Float] =
    Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
  private def tilted(axis: Int, eps: Float): Array[Float] =
    Array.tabulate(64)(i =>
      if (i == axis) 1.0f else if (i == (axis + 1) % 64) eps else 0.0f)

  private def dirs() = (
    Files.createTempDirectory("svd_state").toString,
    Files.createTempDirectory("svd_pairs").toString)

  private def apply(df: DataFrame, id: Long, state: String, pairs: String,
      minMerge: Int = 8): Unit =
    StreamVecDedup.applyBatch(df, id, state, pairs, Planes, Tau, minMerge)

  private def pairSet(pairs: String): Set[(Long, Long)] =
    StreamVecDedup.allPairs(spark, pairs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

  test("cross-batch near-dup vectors surface once, in the completing batch") {
    val (state, pairs) = dirs()
    apply(Seq(Vec(1, unit(0)), Vec(2, unit(7))).toDF(), 0, state, pairs)
    apply(Seq(Vec(3, tilted(0, 0.005f))).toDF(), 1, state, pairs)
    val b1 = spark.read.parquet(s"$pairs/b1")
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    b1 shouldBe Set((1L, 3L)) // completes against batch-0's vector only
    pairSet(pairs) shouldBe Set((1L, 3L)) // orthogonal vec 2 never pairs
  }

  test("within-batch bucket-mates pair once, ordered (a < b)") {
    val (state, pairs) = dirs()
    apply(Seq(Vec(5, unit(3)), Vec(9, tilted(3, 0.005f)), Vec(7, unit(20))).toDF(),
      0, state, pairs)
    pairSet(pairs) shouldBe Set((5L, 9L))
  }

  test("a vec_id redelivered in a LATER batch never self-pairs or duplicates") {
    val (state, pairs) = dirs()
    apply(Seq(Vec(1, unit(0)), Vec(2, tilted(0, 0.005f))).toDF(), 0, state, pairs)
    val once = pairSet(pairs)
    apply(Seq(Vec(1, unit(0))).toDF(), 1, state, pairs) // upstream redelivery
    pairSet(pairs) shouldBe once
    once shouldBe Set((1L, 2L))
  }

  test("redelivering a whole batch overwrites its state and pairs") {
    val (state, pairs) = dirs()
    apply(Seq(Vec(1, unit(0))).toDF(), 0, state, pairs)
    apply(Seq(Vec(2, tilted(0, 0.005f))).toDF(), 1, state, pairs)
    val once = pairSet(pairs)
    apply(Seq(Vec(2, tilted(0, 0.005f))).toDF(), 1, state, pairs) // crash-retry
    pairSet(pairs) shouldBe once
    // index holds exactly one row per vec_id across all runs
    RunStore.readPrev(spark, s"$state/vecs",
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long").add("v", "array<float>")
          .add("nrm", "double").add("bucket", "int").add("pv", "int"),
        Long.MaxValue)
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(1L, 2L)
  }

  test("multi-probe finds the pair across a single-hyperplane boundary; single-probe misses it") {
    import org.apache.spark.sql.functions.col
    def bucketOf(v: Array[Float]): Int =
      Seq(v).toDF("v")
        .select(graft.ext.Similarity.bucketOf(col("v"), Planes).as("b"))
        .head().getInt(0)
    // search a small eps ladder for a tilt that crosses EXACTLY one
    // hyperplane (all eps here keep cosine = 1/sqrt(1+eps^2) >= 0.958 > tau)
    val b0 = bucketOf(unit(0))
    val boundary = Seq(0.01f, 0.02f, 0.05f, 0.1f, 0.15f, 0.2f, 0.3f)
      .find(e => Integer.bitCount(bucketOf(tilted(0, e)) ^ b0) == 1)
    assume(boundary.isDefined, "no hamming-1 tilt under this plane set — probe untestable here")

    val (state, pairs) = dirs()
    apply(Seq(Vec(1, unit(0))).toDF(), 0, state, pairs)
    apply(Seq(Vec(2, tilted(0, boundary.get))).toDF(), 1, state, pairs)
    pairSet(pairs) shouldBe Set((1L, 2L))

    val (state2, pairs2) = dirs()
    StreamVecDedup.applyBatch(Seq(Vec(1, unit(0))).toDF(), 0, state2, pairs2,
      Planes, Tau, minMerge = 8, multiProbe = false)
    StreamVecDedup.applyBatch(Seq(Vec(2, tilted(0, boundary.get))).toDF(), 1, state2, pairs2,
      Planes, Tau, minMerge = 8, multiProbe = false)
    pairSet(pairs2) shouldBe empty // the bucket boundary hides the near-dup
  }

  test("index compaction keeps dirs bounded and pairs complete across boundaries") {
    val (state, pairs) = dirs()
    var maxVecDirs = 0
    for (i <- 0 until 20) {
      val v =
        if (i == 0) Vec(1, unit(0))
        else if (i == 19) Vec(999, tilted(0, 0.005f))
        else Vec(100L + i, unit((i % 30) + 2))
      apply(Seq(v).toDF(), i.toLong, state, pairs, minMerge = 4)
      val n = new java.io.File(s"$state/vecs").listFiles()
        .map(_.getName).count(d => d.startsWith("b") || d.startsWith("c"))
      maxVecDirs = maxVecDirs.max(n)
    }
    maxVecDirs should be <= 8
    pairSet(pairs) should contain((1L, 999L)) // found across compaction boundary
  }
}
