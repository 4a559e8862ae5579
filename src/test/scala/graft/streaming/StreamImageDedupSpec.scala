package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Streaming image-dedup semantics (the dHash twin of StreamDedupSpec /
  * StreamVecDedupSpec): the streamed band index converges to the batch
  * q_image_dhash_pairs result on the same corpus, pairs surface once in
  * the completing batch, redelivery cannot duplicate index rows or
  * pairs, and tier compaction keeps dirs bounded without losing pairs.
  */
case class ImgHash(user_id: Long, dhash: Long)

class StreamImageDedupSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def dirs() = (
    Files.createTempDirectory("sid_state").toString,
    Files.createTempDirectory("sid_pairs").toString)

  private def apply(df: DataFrame, id: Long, state: String, pairs: String,
      minMerge: Int = 8): Unit =
    StreamImageDedup.applyBatch(df, id, state, pairs, minMerge)

  private def pairSet(pairs: String): Set[(Long, Long, Long)] =
    StreamImageDedup.allPairs(spark, pairs)
      .as[(Long, Long, Long)].collect().toSet

  // hashes with controlled Hamming structure: flip k low bits of a base
  private val base = 0x00aa55aa55aa55L // 56-bit pattern
  private def flip(k: Int): Long = base ^ ((1L << k) - 1)

  test("net-corpus equality: streamed batches converge to the batch pairs query") {
    val sfDir = "/root/testdata/sf0.001"
    val hashes = graft.ext.ImageDedup.all("q_image_dhash")
      .fn(spark, sfDir).as[(Long, Long)].collect().toSeq
    hashes.size should be > 10
    val expected = graft.ext.ImageDedup.all("q_image_dhash_pairs")
      .fn(spark, sfDir).as[(Long, Long, Long)].collect().toSet
    expected should not be empty

    val (state, pairs) = dirs()
    val ckpt = Files.createTempDirectory("sid_ckpt").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[ImgHash]
    val q = StreamImageDedup.start(src.toDF(), state, pairs, ckpt)
    try {
      // three uneven batches, split by user_id — every cross-batch pair
      // must surface in its completing batch
      for (m <- 0 until 3) {
        src.addData(hashes.filter(_._1 % 3 == m).map { case (u, h) => ImgHash(u, h) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    pairSet(pairs) shouldBe expected
  }

  test("cross-batch near-dup surfaces once, in the completing batch") {
    val (state, pairs) = dirs()
    apply(Seq(ImgHash(1, base), ImgHash(2, ~base & ((1L << 56) - 1))).toDF(),
      0, state, pairs)
    spark.read.parquet(s"$pairs/b0").collect() shouldBe empty
    apply(Seq(ImgHash(3, flip(3))).toDF(), 1, state, pairs) // hamming 3 vs base
    val b1 = spark.read.parquet(s"$pairs/b1")
      .select("user_a", "user_b", "hamming").as[(Long, Long, Long)].collect().toSet
    b1 shouldBe Set((1L, 3L, 3L))
    pairSet(pairs) shouldBe Set((1L, 3L, 3L)) // the complement never pairs
  }

  test("a user_id redelivered in a LATER batch never self-pairs or duplicates") {
    val (state, pairs) = dirs()
    apply(Seq(ImgHash(1, base), ImgHash(2, flip(2))).toDF(), 0, state, pairs)
    val once = pairSet(pairs)
    once.map(p => (p._1, p._2)) shouldBe Set((1L, 2L))
    apply(Seq(ImgHash(1, base)).toDF(), 1, state, pairs) // upstream redelivery
    pairSet(pairs) shouldBe once
  }

  test("redelivering a whole batch overwrites its state and pairs (crash-retry)") {
    val (state, pairs) = dirs()
    apply(Seq(ImgHash(1, base)).toDF(), 0, state, pairs)
    apply(Seq(ImgHash(2, flip(1))).toDF(), 1, state, pairs)
    val once = pairSet(pairs)
    apply(Seq(ImgHash(2, flip(1))).toDF(), 1, state, pairs) // retry
    pairSet(pairs) shouldBe once
    once.map(p => (p._1, p._2)) shouldBe Set((1L, 2L))
  }

  test("tier compaction bounds dirs and keeps pairs across the boundary") {
    val (state, pairs) = dirs()
    // 12 single-image batches with aggressive compaction; user 11 pairs
    // with user 0 across many compaction boundaries
    for (i <- 0 until 12) {
      val h = if (i == 11) flip(2) else if (i == 0) base
        else (0x123456789abcdL * (i + 7)) & ((1L << 56) - 1)
      apply(Seq(ImgHash(i.toLong, h)).toDF(), i.toLong, state, pairs, minMerge = 2)
    }
    val bandDirs = new java.io.File(s"$state/bands").listFiles()
      .count(_.getName.startsWith("b"))
    bandDirs should be < 12 // compaction actually merged run dirs
    pairSet(pairs).map(p => (p._1, p._2)) should contain((0L, 11L))
  }
}
