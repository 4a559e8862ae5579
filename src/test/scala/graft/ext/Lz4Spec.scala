package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** H93 — hand-rolled LZ4 block codec, cross-validated BOTH directions
  * against lz4-java (the implementation Spark ships).
  */
class Lz4Spec extends AnyFunSuite with Matchers {

  private val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private def corpora: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "single" -> Array[Byte]('x'),
    "tiny" -> "abc".getBytes(UTF_8),
    "all-same" -> Array.fill[Byte](5000)('z'),
    "repetitive" -> ("the quick brown fox " * 400).getBytes(UTF_8),
    "json-ish" -> (0 until 800).map(i => s"""{"id":$i,"lang":"en"}""").mkString("\n").getBytes(UTF_8),
    "random" -> { val r = new scala.util.Random(42); val b = new Array[Byte](10000); r.nextBytes(b); b },
    "far-offsets" -> {
      // > 64 KiB so matches reach across the full 65535 window
      val unit = (0 until 97).map(i => s"block $i ").mkString.getBytes(UTF_8)
      val out = new java.io.ByteArrayOutputStream()
      (0 until 150).foreach(_ => out.write(unit))
      out.toByteArray
    })

  test("our blocks decode under lz4-java's safe decompressor (every corpus)") {
    corpora.foreach { case (name, data) =>
      val ours = Lz4.compress(data)
      val back = factory.safeDecompressor().decompress(ours, data.length)
      withClue(name) { back shouldBe data }
    }
  }

  test("lz4-java fast AND high compressor blocks decode under our strict walk") {
    corpora.foreach { case (name, data) =>
      Seq(factory.fastCompressor(), factory.highCompressor()).foreach { c =>
        val theirs = c.compress(data)
        val back = Lz4.decompress(s"xval-$name", theirs, data.length)
        withClue(name) { back shouldBe data }
      }
    }
  }

  test("our roundtrip is exact and compresses the compressible") {
    corpora.foreach { case (name, data) =>
      val blob = Lz4.compress(data)
      withClue(name) { Lz4.decompress(s"rt-$name", blob, data.length) shouldBe data }
    }
    val rep = ("abcdefgh" * 4000).getBytes(UTF_8)
    Lz4.compress(rep).length should be < rep.length / 10
  }

  test("damage table: every structural lie fails loudly with a byte offset") {
    val data = ("lz4 damage corpus " * 100).getBytes(UTF_8)
    val good = Lz4.compress(data)
    def loud(bytes: Array[Byte], expect: Int, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Lz4.decompress("dmg", bytes, expect))
      e.getMessage should include("lz4 decode at byte")
      e.getMessage should include(needle)
    }
    // declared size too large: the block lands short
    loud(good, data.length + 1, "yielded")
    // declared size too small: literals or a match overflow it
    loud(good, data.length - 1, "overflow")
    // truncated input (literals or a sequence cut at the end)
    loud(good.dropRight(5), data.length, "input")
    // offset 0
    val zeroOff = Array[Byte](0x10, 'a', 0, 0) // 1 literal then offset 0
    loud(zeroOff, 10, "offset 0 is invalid")
    // offset reaching before the output start
    val farOff = Array[Byte](0x10, 'a', 9, 0) // 1 literal then offset 9
    loud(farOff, 10, "reaches before the output start")
    // empty block but a nonzero declared size
    loud(Array.emptyByteArray, 3, "empty block")
  }

  test("hadoop framing: chunk and block headers walked and verified") {
    val data = ("hadoop framed lz4 " * 500).getBytes(UTF_8)
    // build the frame the way hadoop's BlockCompressorStream does
    val block = Lz4.compress(data)
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be32(data.length); be32(block.length); out.write(block)
    val framed = out.toByteArray
    Lz4.hadoopUncompress("hframe", framed, data.length) shouldBe data
    // two chunks concatenated
    val two = framed ++ framed
    Lz4.hadoopUncompress("hframe2", two, data.length * 2) shouldBe (data ++ data)
    // a frame that reassembles to the wrong total is refused
    val e = intercept[IllegalArgumentException](
      Lz4.hadoopUncompress("hframe3", framed, data.length + 1))
    e.getMessage should include("declared")
    // truncated block header
    val e2 = intercept[IllegalArgumentException](
      Lz4.hadoopUncompress("hframe4", framed.take(6), data.length))
    e2.getMessage should include("truncated")
  }
}
