package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.RoaringBitmap
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H94 — hand-rolled Roaring bitmap portable format, cross-validated
  * BOTH directions against org.roaringbitmap (the library Spark
  * ships), run containers included via the library's runOptimize.
  */
class RoaringSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def libSerialize(values: Seq[Int]): Array[Byte] = {
    val rb = RoaringBitmap.bitmapOf(values.toArray: _*)
    val out = new ByteArrayOutputStream()
    rb.serialize(new DataOutputStream(out))
    out.toByteArray
  }
  private def libOptimized(values: Seq[Int]): Array[Byte] = {
    val rb = RoaringBitmap.bitmapOf(values.toArray: _*)
    rb.runOptimize()
    val out = new ByteArrayOutputStream()
    rb.serialize(new DataOutputStream(out))
    out.toByteArray
  }
  private def libDeserialize(b: Array[Byte]): Vector[Int] = {
    val rb = new RoaringBitmap()
    rb.deserialize(new DataInputStream(new ByteArrayInputStream(b)))
    val buf = Vector.newBuilder[Int]
    rb.forEach(new org.roaringbitmap.IntConsumer { def accept(v: Int): Unit = buf += v })
    buf.result()
  }

  private val corpora: Seq[(String, Seq[Int])] = Seq(
    "small-array" -> Seq(1, 5, 7, 4090, 4096),
    "empty" -> Nil,
    "single" -> Seq(42),
    "dense-bitmap" -> (0 until 5000).map(_ * 2), // > 4096 in one chunk
    "multi-key" -> Seq(3, 70000, 70001, 200000, 1 << 20, (1 << 21) + 5),
    "chunk-edges" -> Seq(0, 0xffff, 0x10000, 0x1ffff, 0x20000),
    "five-chunks" -> (0 until 5).flatMap(k => Seq(k * 65536 + 1, k * 65536 + 9)))

  test("our writer is BYTE-IDENTICAL to the library's serialize (no-run form)") {
    corpora.foreach { case (name, vs) =>
      withClue(name) { Roaring.serialize(vs) shouldBe libSerialize(vs) }
    }
  }

  test("our strict walk reads the library's bytes (every corpus)") {
    corpora.foreach { case (name, vs) =>
      withClue(name) {
        Roaring.deserialize(name, libSerialize(vs)) shouldBe vs.distinct.sorted.toVector
      }
    }
  }

  test("run containers: the library's runOptimize'd bytes decode exactly") {
    val runs = Seq(
      "one-run" -> (100 until 3000),
      "runs+array" -> ((0 until 2000) ++ Seq(70000, 70002, 70004)),
      // >= 4 containers so the 12347 offset header is present
      "four-chunk-runs" -> (0 until 4).flatMap(k => k * 65536 until k * 65536 + 600))
    runs.foreach { case (name, vs) =>
      val bytes = libOptimized(vs)
      withClue(name) {
        Roaring.deserialize(name, bytes) shouldBe vs.toVector
      }
    }
  }

  test("the library reads our bytes back (every corpus)") {
    corpora.foreach { case (name, vs) =>
      withClue(name) { libDeserialize(Roaring.serialize(vs)) shouldBe vs.distinct.sorted.toVector }
    }
  }

  test("damage table: every structural lie fails loudly with a byte offset") {
    val good = Roaring.serialize(Seq(1, 5, 7, 70000))
    def loud(mutate: Array[Byte] => Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Roaring.deserialize("dmg", mutate(good.clone())))
      e.getMessage should include("roaring decode at byte")
      e.getMessage should include(needle)
    }
    loud(b => { b(0) = 0; b }, "unknown cookie")
    loud(b => b.dropRight(1), "truncated") // last container value cut mid-u16
    loud(b => b :+ 0.toByte, "walk ended")
    // offset header lie
    loud(b => { b(16) = (b(16) + 1).toByte; b }, "offset header declares")
    // descending keys: swap the two container keys
    loud(b => {
      val k0 = Array(b(8), b(9)); val k1 = Array(b(12), b(13))
      b(8) = k1(0); b(9) = k1(1); b(12) = k0(0); b(13) = k0(1); b
    }, "keys not ascending")
    // array values not ascending: swap first two u16 values of container 0
    loud(b => {
      val p = 24 // 4 cookie + 4 size + 8 desc + 8 offsets
      val v0 = Array(b(p), b(p + 1)); val v1 = Array(b(p + 2), b(p + 3))
      b(p) = v1(0); b(p + 1) = v1(1); b(p + 2) = v0(0); b(p + 3) = v0(1); b
    }, "not ascending")
    intercept[IllegalArgumentException](Roaring.deserialize("dmg", Array[Byte](1, 2)))
      .getMessage should include("cannot hold")
  }

  test("q_deletion_vector is internally consistent at sf0.001") {
    val df = Roaring.q_deletion_vector.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      val n = df.count()
      n should be > 0L
      // no deleted doc survives
      df.filter("doc_id % 7 = 0").count() shouldBe 0L
      // geometry: canonical single-array-container form
      df.filter("dv_bytes <> 16 + 2 * dv_card").count() shouldBe 0L
    } finally df.unpersist()
  }
}
