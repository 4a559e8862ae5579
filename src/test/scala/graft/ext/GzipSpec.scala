package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, GZIPInputStream, GZIPOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H90 — hand-rolled RFC 1952 gzip member walk, cross-validated BOTH
  * directions against the JDK and against python-gzip-written goldens
  * (FNAME + multi-member, committed fixtures).
  */
class GzipSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def golden(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/gz/$name")
    require(in != null, s"missing golden fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("round-trip: with and without FNAME, empty payload, member extents") {
    val p1 = ("line one\n" * 40).getBytes(UTF_8)
    val m1 = GzipCodec.encodeMember(p1, Some("a.jsonl"))
    val got1 = GzipCodec.parseMembers(1L, m1)
    got1.size shouldBe 1
    got1.head.payload shouldBe p1
    got1.head.fname shouldBe Some("a.jsonl")
    got1.head.start shouldBe 0L
    got1.head.end shouldBe m1.length.toLong

    val m2 = GzipCodec.encodeMember(Array.emptyByteArray)
    val got2 = GzipCodec.parseMembers(2L, m2)
    got2.head.payload shouldBe empty
    got2.head.fname shouldBe None
  }

  test("multi-member concatenation: each member framed and verified independently") {
    val parts = Seq("alpha\n", "beta gamma\n", "").map(_.getBytes(UTF_8))
    val stream = parts.zipWithIndex.flatMap { case (p, i) =>
      GzipCodec.encodeMember(p, Some(s"part$i")).toSeq
    }.toArray
    val members = GzipCodec.parseMembers(3L, stream)
    members.size shouldBe 3
    members.map(_.payload.toSeq) shouldBe parts.map(_.toSeq)
    members.map(_.fname) shouldBe Vector(Some("part0"), Some("part1"), Some("part2"))
    // extents tile the stream
    members.head.start shouldBe 0L
    members.sliding(2).foreach { case Vector(a, b) => b.start shouldBe a.end; case _ => }
    members.last.end shouldBe stream.length.toLong
  }

  test("cross-validation A: our bytes read by java.util.zip.GZIPInputStream (multi-member)") {
    val parts = Seq("hello\n", "world of corpora\n").map(_.getBytes(UTF_8))
    val stream = parts.flatMap(p => GzipCodec.encodeMember(p).toSeq).toArray
    // GZIPInputStream transparently concatenates members
    val in = new GZIPInputStream(new ByteArrayInputStream(stream))
    in.readAllBytes() shouldBe parts.flatMap(_.toSeq).toArray
  }

  test("cross-validation B: java.util.zip.GZIPOutputStream bytes read by our parser") {
    val payload = ("{\"k\":1}\n" * 100).getBytes(UTF_8)
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(payload); g.close()
    val members = GzipCodec.parseMembers(4L, bos.toByteArray)
    members.size shouldBe 1
    members.head.payload shouldBe payload
  }

  test("python-gzip goldens: FNAME member and two-member stream parse exactly") {
    val named = GzipCodec.parseMembers(5L, golden("golden_named.jsonl.gz"))
    named.size shouldBe 1
    named.head.fname shouldBe Some("corpus_shard.jsonl")
    new String(named.head.payload, UTF_8) shouldBe
      "{\"doc_id\":1,\"lang\":\"en\"}\n{\"doc_id\":2,\"lang\":\"fr\"}\n"

    val multi = GzipCodec.parseMembers(6L, golden("golden_multi.gz"))
    multi.size shouldBe 2
    new String(multi(0).payload, UTF_8) shouldBe "first member\n"
    new String(multi(1).payload, UTF_8) shouldBe "second member line\n"
  }

  test("FHCRC: verified when present, corrupt header crc refused loudly") {
    // hand-build: base member, set FHCRC flag, splice in the crc16
    val base = GzipCodec.encodeMember("payload".getBytes(UTF_8))
    val withFhcrc = new java.io.ByteArrayOutputStream()
    val header = base.take(10).clone()
    header(3) = (header(3) | 2).toByte
    val crc = new CRC32
    crc.update(header)
    val c16 = (crc.getValue & 0xffffL).toInt
    withFhcrc.write(header)
    withFhcrc.write(c16 & 0xff); withFhcrc.write((c16 >>> 8) & 0xff)
    withFhcrc.write(base, 10, base.length - 10)
    val ok = GzipCodec.parseMembers(7L, withFhcrc.toByteArray)
    ok.head.payload shouldBe "payload".getBytes(UTF_8)

    val bad = withFhcrc.toByteArray.clone()
    bad(10) = (bad(10) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](GzipCodec.parseMembers(7L, bad))
    e.getMessage should include("header CRC16 mismatch")
  }

  test("damage table: every structural lie fails loudly with a byte offset") {
    val good = GzipCodec.encodeMember(("z" * 500).getBytes(UTF_8), Some("n"))
    def loud(mutate: Array[Byte] => Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](GzipCodec.parseMembers(9L, mutate(good.clone())))
      e.getMessage should include("GZIP parse at byte")
      e.getMessage should include(needle)
    }
    loud(b => { b(0) = 'X'.toByte; b }, "bad magic")
    loud(b => { b(2) = 7; b }, "not deflate")
    loud(b => { b(3) = (b(3) | 0x40).toByte; b }, "reserved FLG bits")
    loud(b => b.dropRight(3), "truncated")
    // trailer crc lie
    loud(b => { b(b.length - 8) = (b(b.length - 8) ^ 1).toByte; b }, "trailer crc")
    // trailer isize lie
    loud(b => { b(b.length - 4) = (b(b.length - 4) + 1).toByte; b }, "ISIZE")
    // trailing garbage after the last member reads as a bad next header
    loud(b => b ++ "XY".getBytes(UTF_8), "truncated member header")
    GzipCodec.parseMembers(9L, good) // and the unmutated stream still parses
  }

  test("q_jsonl_gz is internally consistent at sf0.001") {
    val df = GzipCodec.q_jsonl_gz.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      df.count() should be > 0L
      df.filter("lang_rt is null or text_md5 is null").count() shouldBe 0L
    } finally df.unpersist()
  }
}
