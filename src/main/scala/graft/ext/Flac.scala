package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Real FLAC container-metadata codec — the audio twin of the r10/r11
  * MP3/H.264/JPEG header parsers (SURVEY.md §2 H9): a byte-exact
  * metadata-block walk (`fLaC` magic, is-last flag, 7-bit block type,
  * 24-bit big-endian length) plus a bit-exact STREAMINFO parse (20-bit
  * sample rate, 3-bit channels−1, 5-bit bits-per-sample−1, 36-bit total
  * samples straddling byte boundaries — the fields a curation pipeline
  * filters on), with a canonical encode half so [[q_flac_meta]] is
  * oracle-gated end-to-end. Frame (audio) content stays unparsed — the
  * walk reports its byte length; decoding FLAC subframes needs a real
  * entropy decoder and is the same environment-bounded content tier as
  * MP3/H.264 samples.
  *
  * Truncation or a malformed field fails LOUDLY with the byte offset
  * (the [[Multimodal.MediaDecoder]] contract): a metadata walk that
  * guesses would mis-census a training corpus.
  */
object Flac {

  /** Parsed STREAMINFO + block census. */
  final case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, minBlock: Int, maxBlock: Int,
      nMetaBlocks: Int, nPadding: Int, audioBytes: Int)

  // ---- big-endian bit IO (STREAMINFO packs fields across byte bounds) --------

  private final class BitWriter {
    val out = ArrayBuffer.empty[Byte]
    private var acc = 0L
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      require(n <= 56 && (v >> n) == 0, s"value $v overflows $n bits")
      acc = (acc << n) | v
      nbits += n
      while (nbits >= 8) {
        out += ((acc >> (nbits - 8)) & 0xff).toByte
        nbits -= 8
      }
    }
    def bytes: Array[Byte] = { require(nbits == 0, "unaligned"); out.toArray }
  }

  // ---- encode -----------------------------------------------------------------

  /** Canonical FLAC header: `fLaC`, STREAMINFO (34 bytes), `nPadding`
    * PADDING blocks of 4 bytes each, then `audioBytes` deterministic
    * pseudo-frame bytes standing in for the (unparsed) audio frames.
    */
  def encodeFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, nPadding: Int, audioBytes: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"samples $totalSamples")
    val out = ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO block header: is_last iff no padding follows
    out += (if (nPadding == 0) 0x80 else 0x00).toByte // type 0
    out += 0; out += 0; out += 34
    val w = new BitWriter
    w.put(4096, 16) // min block size
    w.put(4096, 16) // max block size
    w.put(0, 24) // min frame size (unknown)
    w.put(0, 24) // max frame size (unknown)
    w.put(sampleRate.toLong, 20)
    w.put((channels - 1).toLong, 3)
    w.put((bitsPerSample - 1).toLong, 5)
    w.put(totalSamples, 36)
    out ++= w.bytes
    // md5 of the unencoded audio: all-zero = unknown, per spec
    out ++= new Array[Byte](16)
    for (i <- 0 until nPadding) {
      out += (if (i == nPadding - 1) 0x81 else 0x01).toByte // type 1, last flag
      out += 0; out += 0; out += 4
      out ++= new Array[Byte](4)
    }
    for (i <- 0 until audioBytes) out += ((i * 31 + 7) & 0xff).toByte
    out.toArray
  }

  // ---- decode -----------------------------------------------------------------

  /** Walk the metadata blocks and bit-parse STREAMINFO. */
  def parseFlac(docId: Long, b: Array[Byte]): Meta = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: FLAC parse at byte $off: $why")
    if (b.length < 4 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      fail(0, "no fLaC magic")
    var pos = 4
    var nBlocks = 0
    var nPadding = 0
    var si: Option[Meta] = None
    var last = false
    while (!last) {
      if (pos + 4 > b.length) fail(pos, "truncated block header")
      val h = b(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      val at = pos
      pos += 4
      if (pos + len > b.length) fail(at, s"truncated block body ($len bytes declared)")
      if (btype == 127) fail(at, "invalid block type 127")
      if (btype == 0) { // STREAMINFO
        if (si.nonEmpty) fail(at, "duplicate STREAMINFO")
        if (nBlocks != 0) fail(at, "STREAMINFO is not the first block")
        if (len != 34) fail(at, s"STREAMINFO length $len != 34")
        // big-endian bit cursor over the 34-byte body
        var bit = 0
        def u(n: Int): Long = {
          var v = 0L
          var i = 0
          while (i < n) {
            val by = b(pos + (bit >> 3)) & 0xff
            v = (v << 1) | ((by >> (7 - (bit & 7))) & 1)
            bit += 1
            i += 1
          }
          v
        }
        val minBlock = u(16).toInt
        val maxBlock = u(16).toInt
        u(24); u(24) // frame-size bounds (unknown in the canonical encode)
        val rate = u(20).toInt
        val ch = u(3).toInt + 1
        val bps = u(5).toInt + 1
        val total = u(36)
        if (rate == 0) fail(at, "sample rate 0 is invalid")
        if (minBlock < 16 && minBlock != 0) fail(at, s"min block size $minBlock < 16")
        si = Some(Meta(rate, ch, bps, total, minBlock, maxBlock, 0, 0, 0))
      } else if (btype == 1) nPadding += 1
      nBlocks += 1
      pos += len
    }
    val s = si.getOrElse(fail(4, "no STREAMINFO block"))
    s.copy(nMetaBlocks = nBlocks, nPadding = nPadding, audioBytes = b.length - pos)
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val Rates = IndexedSeq(8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000)
  private val Bps = IndexedSeq(8, 16, 24)

  /** Every structural field derives closed-form from user_id + event
    * count (the q_h264_meta shape); the payload goes through the REAL
    * bit-level encode and the REAL block walk + STREAMINFO bit parse
    * back, so the oracle gates both halves exactly — including the
    * 36-bit total-samples field straddling five bytes.
    */
  val q_flac_meta: QueryDef = QueryDef(
    s"""SELECT user_id,
       |  CAST(CASE user_id % 8 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
       |    WHEN 3 THEN 24000 WHEN 4 THEN 32000 WHEN 5 THEN 44100 WHEN 6 THEN 48000
       |    ELSE 96000 END AS BIGINT) AS sample_rate,
       |  CAST(user_id % 2 + 1 AS BIGINT) AS channels,
       |  CAST(CASE user_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS BIGINT) AS bits_per_sample,
       |  CAST(LEAST(count(*), 60000) * 4096 + ((user_id % 256) << 28) AS BIGINT) AS total_samples,
       |  CAST(1 + user_id % 3 AS BIGINT) AS n_meta_blocks,
       |  CAST(user_id % 3 AS BIGINT) AS n_padding,
       |  CAST(LEAST(count(*), 100) AS BIGINT) AS audio_bytes
       |FROM events GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (uid, n) =>
          // (uid % 256) << 28 keeps the 36-bit field's high bits exercised
          // while staying exact; the event-count term is capped at 60000
          // so 255<<28 + 60000*4096 stays under 2^36 at ANY scale factor
          val total = math.min(n, 60000L) * 4096L + ((uid & 0xff) << 28)
          val enc = encodeFlac(Rates((uid % 8).toInt), (uid % 2 + 1).toInt,
            Bps((uid % 3).toInt), total, nPadding = (uid % 3).toInt,
            audioBytes = math.min(n, 100L).toInt)
          val m = parseFlac(uid, enc)
          (uid, m.sampleRate.toLong, m.channels.toLong, m.bitsPerSample.toLong,
            m.totalSamples, m.nMetaBlocks.toLong, m.nPadding.toLong,
            m.audioBytes.toLong)
        }
      }
      .toDF("user_id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "n_meta_blocks", "n_padding", "audio_bytes")
      .orderBy(col("user_id"))
  }

  val all: Map[String, QueryDef] = Map("q_flac_meta" -> q_flac_meta)
}
