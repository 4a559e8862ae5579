package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** ISO BMFF / MP4 box walk — the video CONTAINER member of the
  * header-parser family (H.264 in Multimodal.scala parses the elementary
  * stream; real corpora carry it inside MP4). Both halves real and
  * byte-exact: the encoder writes a canonical box tree (ftyp, moov with
  * mvhd + one trak/tkhd/mdia/mdhd/hdlr per track, mdat), the parser
  * walks it recursively — 32-bit sizes, the 64-bit `largesize` escape
  * (size == 1), size == 0 = to-EOF, container descent, version-0 full
  * boxes — and extracts the curation fields: movie timescale/duration,
  * track census by handler type, video dimensions from tkhd's 16.16
  * fixed-point, and mdhd's packed 3×5-bit ISO-639 language code.
  * Truncation, a size smaller than the header, a box overrunning its
  * parent, or a missing required box each fail LOUDLY with the byte
  * offset (the MediaDecoder contract).
  *
  * Scale shape: one per-user aggregation + one mapPartitions pass, zero
  * further shuffles — the q_h264_meta shape.
  */
object Mp4 {

  /** Parsed movie-level metadata + box census. */
  final case class Meta(timescale: Long, duration: Long, nTracks: Int,
      nVideo: Int, nAudio: Int, width: Int, height: Int, lang: String,
      nBoxes: Int, mdatBytes: Long)

  // ---- encode -----------------------------------------------------------------

  private def be32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += ((v >> 24) & 0xff).toByte; out += ((v >> 16) & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }
  private def be64(out: ArrayBuffer[Byte], v: Long): Unit = {
    be32(out, v >>> 32); be32(out, v & 0xffffffffL)
  }
  private def fourcc(out: ArrayBuffer[Byte], s: String): Unit =
    out ++= s.getBytes("US-ASCII")

  /** A box with 32-bit size framing. */
  private def box(typ: String)(body: ArrayBuffer[Byte] => Unit): ArrayBuffer[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    body(b)
    val out = ArrayBuffer.empty[Byte]
    be32(out, 8L + b.size)
    fourcc(out, typ)
    out ++= b
    out
  }

  /** Pack an ISO-639-2/T code into mdhd's 3×5-bit field. */
  private[ext] def packLang(lang: String): Int = {
    require(lang.length == 3, s"language '$lang' not 3 chars")
    lang.foldLeft(0)((acc, c) => (acc << 5) | (c - 0x60))
  }

  /** Canonical MP4: ftyp + moov(mvhd + one video trak + nAudio audio
    * traks) + mdat. `largeMdat` frames the mdat with the 64-bit
    * largesize escape (size == 1), exercising the parser's other
    * size-framing branch.
    */
  def encodeMp4(timescale: Long, duration: Long, width: Int, height: Int,
      nAudio: Int, lang: String, mdatBytes: Int,
      largeMdat: Boolean = false): Array[Byte] = {
    require(timescale > 0 && timescale <= 0xffffffffL, s"timescale $timescale not u32")
    require(duration >= 0 && duration <= 0xffffffffL, s"duration $duration not u32")
    require(nAudio >= 0 && mdatBytes >= 0)
    val out = ArrayBuffer.empty[Byte]
    out ++= box("ftyp") { b =>
      fourcc(b, "isom"); be32(b, 512); fourcc(b, "isom"); fourcc(b, "mp41")
    }
    def trak(id: Int, video: Boolean): ArrayBuffer[Byte] = box("trak") { t =>
      t ++= box("tkhd") { b =>
        be32(b, 0x000007) // version 0 + enabled/in-movie/in-preview flags
        be32(b, 0); be32(b, 0) // creation/modification time
        be32(b, id.toLong)
        be32(b, 0) // reserved
        be32(b, duration)
        b ++= new Array[Byte](8) // reserved
        be32(b, 0) // layer(2) + alternate_group(2)
        be32(b, if (video) 0 else 0x01000000L) // volume(2) 8.8 fixed + reserved(2)
        // identity matrix (9 x 32-bit)
        Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(be32(b, _))
        be32(b, if (video) width.toLong << 16 else 0) // 16.16 fixed
        be32(b, if (video) height.toLong << 16 else 0)
      }
      t ++= box("mdia") { m =>
        m ++= box("mdhd") { b =>
          be32(b, 0) // version 0
          be32(b, 0); be32(b, 0)
          be32(b, timescale)
          be32(b, duration)
          b += ((packLang(lang) >> 8) & 0xff).toByte
          b += (packLang(lang) & 0xff).toByte
          b += 0; b += 0 // pre_defined
        }
        m ++= box("hdlr") { b =>
          be32(b, 0); be32(b, 0)
          fourcc(b, if (video) "vide" else "soun")
          be32(b, 0); be32(b, 0); be32(b, 0)
          b += 0 // empty name, NUL-terminated
        }
      }
    }
    out ++= box("moov") { mv =>
      mv ++= box("mvhd") { b =>
        be32(b, 0) // version 0
        be32(b, 0); be32(b, 0)
        be32(b, timescale)
        be32(b, duration)
        be32(b, 0x10000) // rate 1.0 (16.16)
        be32(b, 0x01000000L) // volume 1.0 (8.8) + reserved(2)
        b ++= new Array[Byte](8)
        Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(be32(b, _))
        b ++= new Array[Byte](24) // pre_defined
        be32(b, (2 + nAudio).toLong) // next track id
      }
      mv ++= trak(1, video = true)
      (0 until nAudio).foreach(i => mv ++= trak(2 + i, video = false))
    }
    val payload = Array.tabulate(mdatBytes)(i => ((i * 37 + 11) & 0xff).toByte)
    if (largeMdat) {
      be32(out, 1); fourcc(out, "mdat"); be64(out, 16L + mdatBytes)
      out ++= payload
    } else {
      be32(out, 8L + mdatBytes); fourcc(out, "mdat")
      out ++= payload
    }
    out.toArray
  }

  // ---- decode -----------------------------------------------------------------

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  /** Recursive box walk + field extraction. */
  def parseMp4(docId: Long, b: Array[Byte]): Meta = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: MP4 parse at byte $off: $why")
    def u32(p: Int): Long = {
      if (p + 4 > b.length) fail(p.toLong, "truncated u32")
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    def u64(p: Int): Long = {
      if (p + 8 > b.length) fail(p.toLong, "truncated u64")
      (u32(p) << 32) | u32(p + 4)
    }
    var timescale = -1L
    var duration = -1L
    var nVideo = 0
    var nAudio = 0
    var width = 0
    var height = 0
    var lang: String = null
    var nBoxes = 0
    var mdatBytes = -1L
    var sawFtyp = false
    // walk boxes in [from, to); `path` is the container nesting
    def walk(from: Int, to: Int, path: List[String]): Unit = {
      var pos = from
      while (pos < to) {
        val at = pos
        if (to - pos < 8) fail(at.toLong,
          s"trailing ${to - pos} bytes do not tile their parent (no room for a box header)")
        val size0 = u32(pos)
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        var hdr = 8
        val size: Long =
          if (size0 == 1) { val s = u64(pos + 8); hdr = 16; s }
          else if (size0 == 0) (to - pos).toLong // to end of enclosing space
          else size0
        if (size < hdr) fail(at.toLong, s"box '$typ' size $size smaller than its header")
        if (pos + size > to) fail(at.toLong, s"box '$typ' of $size bytes overruns its parent")
        nBoxes += 1
        val bodyAt = pos + hdr
        val bodyEnd = (pos + size).toInt
        // leaf reads must stay INSIDE the box body — an undersized box
        // must fail by name, never read sibling bytes as its own fields
        def need(n: Int): Unit =
          if (bodyEnd - bodyAt < n) fail(at.toLong, s"'$typ' body ${bodyEnd - bodyAt} bytes, needs $n")
        typ match {
          case t if Containers(t) => walk(bodyAt, bodyEnd, t :: path)
          case "ftyp" => sawFtyp = true
          case "mvhd" =>
            need(20)
            if (u32(bodyAt) >>> 24 != 0) fail(at.toLong, "mvhd version != 0 unsupported")
            timescale = u32(bodyAt + 12)
            duration = u32(bodyAt + 16)
          case "mdhd" =>
            need(22)
            if (u32(bodyAt) >>> 24 != 0) fail(at.toLong, "mdhd version != 0 unsupported")
            val packed = (((b(bodyAt + 20) & 0xff) << 8) | (b(bodyAt + 21) & 0xff)) & 0x7fff
            val l = new String(Array(
              ((packed >> 10) & 0x1f) + 0x60,
              ((packed >> 5) & 0x1f) + 0x60,
              (packed & 0x1f) + 0x60).map(_.toChar))
            if (lang == null) lang = l
            else if (lang != l) fail(at.toLong, s"tracks disagree on language ($lang vs $l)")
          case "hdlr" =>
            need(12)
            val handler = new String(b, bodyAt + 8, 4, "US-ASCII")
            if (handler == "vide") nVideo += 1
            else if (handler == "soun") nAudio += 1
            else fail(at.toLong, s"handler '$handler' unsupported")
          case "tkhd" =>
            need(84)
            if (u32(bodyAt) >>> 24 != 0) fail(at.toLong, "tkhd version != 0 unsupported")
            val w = (u32(bodyAt + 76) >> 16).toInt // 16.16 fixed
            val h = (u32(bodyAt + 80) >> 16).toInt
            if (w > 0) { width = w; height = h }
          case "mdat" => mdatBytes = size - hdr
          case _ => () // unknown leaf boxes are skippable by design
        }
        pos = bodyEnd
      }
      // pos == to is guaranteed here: the overrun check bounds every
      // bodyEnd by `to`, and the entry guard rejects sub-header residue
    }
    if (b.length < 8) fail(0, "shorter than one box header")
    walk(0, b.length, Nil)
    if (!sawFtyp) fail(0, "no ftyp box")
    if (timescale < 0) fail(0, "no mvhd box")
    if (lang == null) fail(0, "no mdhd box")
    if (mdatBytes < 0) fail(0, "no mdat box")
    Meta(timescale, duration, nVideo + nAudio, nVideo, nAudio,
      width, height, lang, nBoxes, mdatBytes)
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val Langs = IndexedSeq("eng", "und", "fra")

  /** Structure closed-form from user_id + event count (the q_h264_meta
    * shape); every fifth user frames mdat with the 64-bit largesize
    * escape so both size branches stay oracle-gated.
    */
  val q_mp4_meta: QueryDef = QueryDef(
    s"""SELECT user_id,
       |  CAST((user_id % 4 + 1) * 1000 AS BIGINT) AS timescale,
       |  CAST(LEAST(count(*), 500) * 100 AS BIGINT) AS duration,
       |  CAST(2 + user_id % 2 AS BIGINT) AS n_tracks,
       |  CAST(1 + user_id % 2 AS BIGINT) AS n_audio,
       |  CAST((user_id % 16 + 4) * 16 AS BIGINT) AS width,
       |  CAST((user_id % 9 + 3) * 16 AS BIGINT) AS height,
       |  CASE user_id % 3 WHEN 0 THEN 'eng' WHEN 1 THEN 'und' ELSE 'fra' END AS lang,
       |  CAST(4 + 5 * (2 + user_id % 2) AS BIGINT) AS n_boxes,
       |  CAST(LEAST(count(*), 64) AS BIGINT) AS mdat_bytes
       |FROM events GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (uid, n) =>
          val m = parseMp4(uid, encodeMp4(
            timescale = (uid % 4 + 1) * 1000,
            duration = math.min(n, 500L) * 100,
            width = ((uid % 16 + 4) * 16).toInt,
            height = ((uid % 9 + 3) * 16).toInt,
            nAudio = (1 + uid % 2).toInt,
            lang = Langs((uid % 3).toInt),
            mdatBytes = math.min(n, 64L).toInt,
            largeMdat = uid % 5 == 0))
          (uid, m.timescale, m.duration, m.nTracks.toLong, m.nAudio.toLong,
            m.width.toLong, m.height.toLong, m.lang, m.nBoxes.toLong,
            m.mdatBytes)
        }
      }
      .toDF("user_id", "timescale", "duration", "n_tracks", "n_audio",
        "width", "height", "lang", "n_boxes", "mdat_bytes")
      .orderBy(col("user_id"))
  }

  val all: Map[String, QueryDef] = Map("q_mp4_meta" -> q_mp4_meta)
}
