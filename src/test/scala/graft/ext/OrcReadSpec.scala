package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The ORC stripe-data reader (OrcRead): the RLEv2 golden byte vectors
  * PUBLISHED IN THE ORC SPEC ITSELF decode exactly; value patterns
  * chosen to force each RLEv2 sub-encoding round-trip through the real
  * orc-core writer; whole spark.write.orc files under every codec
  * decode row-identical to spark.read (nulls + both string encodings);
  * damage fails loudly.
  */
class OrcReadSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-orcread").toString

  // ---- the spec's own worked examples (ORC specification, RLEv2 section) ---------

  test("RLEv2 golden vectors from the ORC spec decode exactly") {
    // SHORT_REPEAT: [10000, 10000, 10000, 10000, 10000] -> 0a 27 10 (unsigned)
    OrcRead.rleV2("sr", Array(0x0a, 0x27, 0x10).map(_.toByte), 0, 3,
      signed = false, 5).toSeq shouldBe Seq.fill(5)(10000L)
    // DIRECT: [23713, 43806, 57005, 48879] -> 5e 03 5c a1 ab 1e de ad be ef
    OrcRead.rleV2("dir",
      Array(0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef).map(_.toByte),
      0, 10, signed = false, 4).toSeq shouldBe Seq(23713L, 43806L, 57005L, 48879L)
    // DELTA: [2, 3, 5, 7, 11, 13, 17, 19, 23, 29] -> c6 09 02 02 22 42 42 46
    OrcRead.rleV2("del",
      Array(0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46).map(_.toByte),
      0, 8, signed = false, 10).toSeq shouldBe
      Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L)
    // (PATCHED_BASE has no hand-checkable published vector of the same
    // shape; it is pinned below by orc-core round-trips whose outlier
    // patterns force it, and by the spark-file row-identity legs.)
  }

  test("RLEv2 damage fails loudly") {
    intercept[IllegalArgumentException](
      OrcRead.rleV2("t", Array(0x5e, 0x03, 0x5c).map(_.toByte), 0, 3, signed = false, 4)
    ).getMessage should include("crosses the stream end")
    intercept[IllegalArgumentException](
      OrcRead.rleV2("t", Array(0x0a, 0x27, 0x10).map(_.toByte), 0, 3, signed = false, 3)
    ).getMessage should include("overruns")
    intercept[IllegalArgumentException](
      OrcRead.byteRle("t", Array(0x05).map(_.toByte), 0, 1, 8)
    ).getMessage should include("run value truncated")
  }

  // ---- sub-encoding forcing through the real writer -------------------------------

  private def roundTripLongs(vals: Seq[Long]): Seq[Long] = {
    val docs = vals.map(v => (v, "x", "en"))
    // writeViaOrcCore sorts nothing; doc_id carries the pattern
    val bytes = OrcLite.writeViaOrcCore(docs, "ZLIB")
    val (_, cols) = OrcRead.readAllOrc("rt", bytes)
    cols(1).map(_.asInstanceOf[Long])
  }

  test("orc-core-written integer patterns round-trip (delta/direct/short-repeat/patched)") {
    val rnd = new java.util.Random(7)
    val patterns = Seq(
      (0 until 600).map(_.toLong * 3), // monotone -> DELTA
      Seq.fill(600)(42L), // constant -> SHORT_REPEAT / fixed delta
      (0 until 600).map(_ => rnd.nextInt(1 << 16).toLong), // noise -> DIRECT
      (0 until 600).map(i => if (i % 97 == 0) 1000000000L + i else 2000L + (i % 50)), // outliers -> PATCHED_BASE
      (0 until 600).map(i => if (i % 2 == 0) -1L * rnd.nextInt(1 << 20) else rnd.nextInt(1 << 20).toLong), // signed
      Seq(Long.MaxValue, Long.MinValue + 1, 0L, -1L, 1L) ++ (0 until 300).map(_.toLong)
    )
    patterns.zipWithIndex.foreach { case (p, i) =>
      withClue(s"pattern $i:") { roundTripLongs(p) shouldBe p }
    }
  }

  // ---- whole files: spark.write -> our reader ---------------------------------------

  private def sampleDf = {
    val rows = (0 until 1500).map { i =>
      (i * 7L, s"text-$i-" + ("w" * (i % 29)),
        if (i % 11 == 0) null else Seq("en", "de", "fr", "nl")(i % 4),
        if (i % 5 == 0) None else Some(i * 31L))
    }
    rows.toDF("id", "text", "lang", "num")
  }

  private def onePartFile(dir: String): java.nio.file.Path = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".orc"))
    part.length shouldBe 1
    part.head.toPath
  }

  for (codec <- Seq("zlib", "snappy", "zstd", "none")) {
    test(s"spark-written ORC ($codec) decodes row-identical to spark.read") {
      val dir = tmp() + s"/$codec"
      sampleDf.coalesce(1).write.option("compression", codec).orc(dir)
      val bytes = Files.readAllBytes(onePartFile(dir))
      val (m, cols) = OrcRead.readAllOrc(codec, bytes)
      val ours = (0 until m.numberOfRows.toInt).map { i =>
        (cols(1)(i).asInstanceOf[Long],
          cols(2)(i).asInstanceOf[String],
          cols(3)(i).asInstanceOf[String],
          Option(cols(4)(i)).map(_.asInstanceOf[Long]))
      }.sortBy(_._1)
      val theirs = spark.read.orc(dir)
        .as[(Long, String, Option[String], Option[Long])].collect().toSeq
        .map(r => (r._1, r._2, r._3.orNull, r._4)).sortBy(_._1)
      ours shouldBe theirs
    }
  }

  test("the query's writer round-trips with nulls through the PRESENT bitmap") {
    val docs = (0 until 257).map(i => (i.toLong, s"b$i", Seq("sv", "fi")(i % 2)))
    val bytes = OrcLite.writeViaOrcCoreOpt(docs, "ZLIB")
    val (m, cols) = OrcRead.readAllOrc("opt", bytes)
    m.numberOfRows shouldBe 257L
    cols(4).zipWithIndex.foreach { case (v, i) =>
      if (i % 3 == 0) assert(v == null, s"row $i")
      else v shouldBe (i * 37 + 11) % 1000L
    }
    // lang is low-cardinality: the DICTIONARY_V2 path really engaged
    val (streams, encs) = OrcRead.parseStripeFooter("opt", bytes,
      m.stripes.head, m.compression)
    encs(3).kind shouldBe "DICTIONARY_V2"
    encs(3).dictionarySize shouldBe 2
    streams.exists(s => s.column == 3 && s.kind == "DICTIONARY_DATA") shouldBe true
  }

  test("q_orc_read: decoded aggregates match a driver-side recompute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = OrcRead.q_orc_read.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    got.length should be > 0
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    got.map(_._2).sum shouldBe docs.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val firstFile = docs.filter(_._1 / 100 == got.head._1)
    val want = md.digest(firstFile.map(_._2).mkString.getBytes(UTF_8))
      .map(x => f"$x%02x").mkString
    got.head._3 shouldBe want
  }
}
