package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import com.github.luben.zstd.{Zstd, ZstdCompressCtx}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The RFC 8878 frame walk behind q_zstd_shard (ZstdCodec.scala):
  * cross-validated against the REAL zstd codec in both directions (the
  * library's frames parse under our walk; a frame WE craft by hand
  * decompresses under the library), plus the loud-failure contract.
  * No SparkSession — the walk is pure; the Spark plumbing is
  * driver-gated by the oracle query.
  */
class ZstdSpec extends AnyFunSuite with Matchers {

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("property: library frames at several levels parse and round-trip (40 cases)") {
    val g = for {
      n <- Gen.oneOf(Gen.choose(0, 64), Gen.choose(1000, 60000))
      mode <- Gen.oneOf("random", "runs", "text")
      level <- Gen.oneOf(1, 3, 9, 19)
    } yield (n, mode, level)
    for (seed <- 1L to 40L) {
      val (n, mode, level) = gen(g, seed * 31L)
      val payload = mode match {
        case "random" => gen(Gen.listOfN(n, Gen.choose(-128, 127)), seed)
          .map(_.toByte).toArray
        case "runs" => Array.fill(n)((seed % 7).toByte)
        case "text" => ("the quick brown zstd fox " * (n / 25 + 1)).take(n)
          .getBytes(UTF_8)
      }
      val zst = Zstd.compress(payload, level)
      val frames = ZstdCodec.parseZstd(seed, zst)
      withClue(s"n=$n mode=$mode level=$level: ") {
        frames.size shouldBe 1
        val f = frames.head
        f.skippable shouldBe false
        f.offset shouldBe 0L
        f.byteLen shouldBe zst.length // the walk lands exactly on the frame end
        f.contentSize shouldBe payload.length.toLong // single-shot always records FCS
        f.nBlocks should be >= 1
        if (payload.nonEmpty)
          Zstd.decompress(zst, f.contentSize.toInt) shouldBe payload
      }
    }
  }

  test("multi-frame streams with an interleaved skippable frame walk exactly") {
    val a = Zstd.compress("first shard".getBytes(UTF_8), 3)
    val b = Zstd.compress("second shard, rather longer than the first".getBytes(UTF_8), 3)
    val skipContent = "cdx index goes here".getBytes(UTF_8)
    val skip = le32(0x184d2a5eL) ++ le32(skipContent.length.toLong) ++ skipContent
    val frames = ZstdCodec.parseZstd(0L, a ++ skip ++ b)
    frames.size shouldBe 3
    frames(0).contentSize shouldBe 11L
    frames(1).skippable shouldBe true
    frames(1).contentSize shouldBe skipContent.length.toLong
    frames(1).offset shouldBe a.length.toLong
    frames(2).contentSize shouldBe 42L
    frames(2).offset shouldBe (a.length + skip.length).toLong
  }

  test("checksummed frames report the flag and the walk consumes the trailer") {
    val ctx = new ZstdCompressCtx()
    try {
      ctx.setChecksum(true)
      ctx.setLevel(3)
      val payload = "checksummed payload ".* (20).getBytes(UTF_8)
      val zst = ctx.compress(payload)
      val frames = ZstdCodec.parseZstd(0L, zst)
      frames.size shouldBe 1
      frames.head.hasChecksum shouldBe true
      frames.head.byteLen shouldBe zst.length
      frames.head.contentSize shouldBe payload.length.toLong
    } finally ctx.close()
  }

  test("a hand-crafted RLE frame decompresses under the REAL library") {
    // magic | FHD: single-segment + 1-byte FCS | FCS=100 | one RLE block
    // (last=1, type=1, size=100 -> header 803) | the one repeated byte
    val h = 803L
    val crafted = le32(0xfd2fb528L) ++ Array(0x20.toByte, 100.toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
      'A'.toByte)
    val frames = ZstdCodec.parseZstd(0L, crafted)
    frames.size shouldBe 1
    frames.head.contentSize shouldBe 100L
    frames.head.nBlocks shouldBe 1
    frames.head.byteLen shouldBe crafted.length
    // the real decoder accepts our crafting — spec compliance, not
    // self-consistency
    Zstd.decompress(crafted, 100) shouldBe Array.fill(100)('A'.toByte)
  }

  test(".warc.zst: frame-per-record round-trip with adversarial payloads and a skipped index frame") {
    // payloads that break delimiter-scanning readers: a literal WARC
    // version line and a CRLFCRLF inside the body
    val recs = Seq(
      ("https://a/1", "urn:1", "plain body".getBytes(UTF_8)),
      ("https://a/2", "urn:2", "WARC/1.0\r\nfake: header\r\n\r\ninner".getBytes(UTF_8)),
      ("https://a/3", "urn:3", Array.empty[Byte]))
    val zst = ZstdCodec.encodeWarcZst(recs, "the cdx".getBytes(UTF_8))
    val (parsed, data, skip) = ZstdCodec.parseWarcZst(0L, zst)
    data shouldBe 3
    skip shouldBe 1
    parsed.map(_.uri) shouldBe Vector("https://a/1", "https://a/2", "https://a/3")
    parsed.map(r => new String(r.payload, UTF_8)) shouldBe
      recs.map(r => new String(r._3, UTF_8)).toVector
    // offsets are in the DECOMPRESSED stream: each record starts where
    // the previous ended (header + payload + terminator)
    parsed(1).offset shouldBe (parsed(0).offset +
      92 + "urn:1".length + "https://a/1".length + "10".length + 10)
    // truncation mid-frame fails loudly through the frame walk
    intercept[IllegalArgumentException](
      ZstdCodec.parseWarcZst(1L, zst.take(zst.length / 2)))
      .getMessage should include("at byte")
  }

  test("seekable format: footer-first table parse, per-frame fetch, walkable as skippable") {
    val recs = (0 until 5).map(i =>
      (s"https://a/$i", s"urn:$i", s"payload number $i ${"x" * i * 7}".getBytes(UTF_8)))
    val shard = ZstdCodec.encodeWarcZstSeekable(recs)
    val table = ZstdCodec.parseSeekTable(0L, shard)
    table.size shouldBe 5
    // entries cover exactly the data-frame bytes; the table itself is a
    // legal skippable frame so a plain frame walk still traverses the file
    val frames = ZstdCodec.parseZstd(0L, shard)
    frames.count(!_.skippable) shouldBe 5
    frames.count(_.skippable) shouldBe 1
    frames.filterNot(_.skippable).map(_.byteLen) shouldBe table.map(_.compressedSize)
    // every fetch round-trips its record
    (0 until 5).foreach { n =>
      val rec = Warc.parseWarcRecords(0L, ZstdCodec.seekFetch(0L, shard, table, n))
      rec.size shouldBe 1
      rec.head.uri shouldBe s"https://a/$n"
      new String(rec.head.payload, UTF_8) shouldBe new String(recs(n)._3, UTF_8)
    }
  }

  test("seekable fetch provably touches only the target frame: all others corrupted") {
    val recs = (0 until 4).map(i =>
      (s"https://b/$i", s"urn:b:$i", s"record $i body".getBytes(UTF_8)))
    val shard = ZstdCodec.encodeWarcZstSeekable(recs)
    val table = ZstdCodec.parseSeekTable(7L, shard)
    val offsets = table.scanLeft(0)(_ + _.compressedSize)
    (0 until 4).foreach { n =>
      val hostile = shard.clone()
      java.util.Arrays.fill(hostile, 0, offsets(n), 0x55.toByte)
      java.util.Arrays.fill(hostile, offsets(n) + table(n).compressedSize,
        offsets.last, 0x55.toByte)
      // a reader that decompressed the prefix (or any other frame) would
      // throw on the garbage; the slice-based fetch cannot see it
      val rec = Warc.parseWarcRecords(7L, ZstdCodec.seekFetch(7L, hostile, table, n))
      new String(rec.head.payload, UTF_8) shouldBe s"record $n body"
    }
  }

  test("dictionary frames: walk reports the trained dict id; no-dict readers still fail loudly") {
    val docs = (0 until 24).map(i => s"small record number $i with shared structure".getBytes(UTF_8))
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(
      docs.map(_.length).sum * 16 + 1024, 1024)
    (0 until 16).foreach(_ => docs.foreach(d => trainer.addSample(d)))
    val dict = trainer.trainSamples()
    val dictId = Zstd.getDictIdFromDict(dict)
    dictId should not be 0L
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    cctx.setLevel(3); cctx.loadDict(dict)
    val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
    dctx.loadDict(dict)
    try docs.foreach { d =>
      val frame = cctx.compress(d)
      // dict-aware walk: the frame names exactly the trained dictionary
      val walked = ZstdCodec.parseZstd(0L, frame, allowDict = true)
      walked.size shouldBe 1
      walked.head.dictId shouldBe dictId
      walked.head.contentSize shouldBe d.length.toLong
      // the fail-loud contract survives for readers with no dict in hand
      intercept[IllegalArgumentException](ZstdCodec.parseZstd(0L, frame))
        .getMessage should include("requires dictionary")
      // real dict decompression round-trips, sized by OUR walked FCS
      dctx.decompress(frame, walked.head.contentSize.toInt) shouldBe d
    } finally { cctx.close(); dctx.close() }
  }

  test("seek table structural damage fails loudly") {
    val shard = ZstdCodec.encodeWarcZstSeekable(
      Seq(("https://c/0", "urn:c:0", "x".getBytes(UTF_8))))
    // bad footer magic
    val badMagic = shard.clone(); badMagic(shard.length - 1) = 0x00
    intercept[IllegalArgumentException](ZstdCodec.parseSeekTable(0L, badMagic))
      .getMessage should include("footer magic")
    // reserved descriptor bits
    val badDesc = shard.clone(); badDesc(shard.length - 5) = 0x04
    intercept[IllegalArgumentException](ZstdCodec.parseSeekTable(0L, badDesc))
      .getMessage should include("reserved descriptor")
    // frame count inconsistent with the file size
    val badCount = shard.clone(); badCount(shard.length - 9) = 0x7f
    intercept[IllegalArgumentException](ZstdCodec.parseSeekTable(0L, badCount))
      .getMessage should (include("inconsistent") or include("cover"))
    // too short for any footer
    intercept[IllegalArgumentException](ZstdCodec.parseSeekTable(0L, shard.take(10)))
      .getMessage should include("too short")
    // out-of-range fetch
    val table = ZstdCodec.parseSeekTable(0L, shard)
    intercept[IllegalArgumentException](ZstdCodec.seekFetch(0L, shard, table, 1))
      .getMessage should include("outside table")
  }

  test("structural damage fails loudly with the byte offset") {
    val zst = Zstd.compress("loud failure please".getBytes(UTF_8), 3)
    // empty stream (failed/zero-byte shard download)
    intercept[IllegalArgumentException](ZstdCodec.parseZstd(0L, Array.empty[Byte]))
      .getMessage should include("empty stream")
    // bad magic
    val bad = zst.clone(); bad(0) = 0x00
    intercept[IllegalArgumentException](ZstdCodec.parseZstd(1L, bad))
      .getMessage should include("bad zstd magic")
    // reserved FHD bit
    val res = zst.clone(); res(4) = (res(4) | 0x08).toByte
    intercept[IllegalArgumentException](ZstdCodec.parseZstd(2L, res))
      .getMessage should include("reserved FHD bit")
    // dictionary requirement
    val dict = le32(0xfd2fb528L) ++ Array(0x21.toByte, 7.toByte, 50.toByte)
    intercept[IllegalArgumentException](ZstdCodec.parseZstd(3L, dict))
      .getMessage should include("requires dictionary")
    // reserved block type: craft header with type=3
    val hdr = 1L | (3L << 1) | (4L << 3)
    val rblk = le32(0xfd2fb528L) ++ Array(0x20.toByte, 4.toByte,
      (hdr & 0xff).toByte, ((hdr >> 8) & 0xff).toByte, ((hdr >> 16) & 0xff).toByte)
    intercept[IllegalArgumentException](ZstdCodec.parseZstd(4L, rblk))
      .getMessage should include("reserved block type")
  }

  test("property: every strict prefix of a single frame fails loudly (all cuts)") {
    val zst = Zstd.compress("truncation torture payload, long enough for several fields".getBytes(UTF_8), 3)
    for (cut <- 1 until zst.length) {
      val e = intercept[IllegalArgumentException](
        ZstdCodec.parseZstd(cut.toLong, zst.take(cut)))
      withClue(s"cut=$cut: ") { e.getMessage should include("at byte") }
    }
  }
}
