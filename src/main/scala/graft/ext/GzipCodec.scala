package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.zip.{CRC32, Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** RFC 1952 gzip member framing — the wire format `.jsonl.gz` training
  * corpora actually ship in (and the framing under CommonCrawl's WARC,
  * which H71 reads through the JDK; this module hand-rolls the frame
  * walk itself). Writer: the 10-byte header (magic 1f 8b, CM=8
  * deflate, deterministic MTIME=0, OS=255), optional FNAME, a raw
  * [[Deflater]] stream, then the CRC32 + ISIZE trailer. Parser: a
  * STRICT member walk — magic/CM checked, FTEXT/FHCRC/FEXTRA/FNAME/
  * FCOMMENT flags all implemented (header CRC16 VERIFIED when present,
  * reserved flag bits refused), the deflate stream inflated with exact
  * input tracking, and the trailer's CRC32 and ISIZE (mod 2^32)
  * verified against the decompressed bytes; members may concatenate
  * (RFC 1952 §2.2) and each is framed + verified independently.
  * Truncation, bad magic, reserved flags, a corrupt header CRC, a crc
  * or isize lie, and trailing garbage after the last member each fail
  * LOUDLY with the byte offset (the MediaDecoder contract) — a gzip
  * reader that skips trailer verification serves silently corrupt
  * corpus shards.
  *
  * [[q_jsonl_gz]] gates the whole path: 16 documents per `.jsonl.gz`
  * shard (one JSON object per line, full text included with strict
  * escaping), compressed and re-parsed by the hand-rolled codec, every
  * line re-decoded by the strict JSON parser shared with [[Safetensors]].
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode+parse pass, zero further shuffles — embarrassingly parallel
  * over shards, exactly how `.jsonl.gz` corpora are processed.
  */
object GzipCodec {

  /** One parsed member: decompressed payload, optional FNAME, and the
    * byte extent [start, end) of the member inside the stream.
    */
  final case class Member(payload: Array[Byte], fname: Option[String], start: Long, end: Long)

  // ---- encode -----------------------------------------------------------------

  /** One deterministic member: MTIME=0, XFL=0, OS=255, optional FNAME. */
  def encodeMember(payload: Array[Byte], fname: Option[String] = None): Array[Byte] = {
    val out = new ArrayBuffer[Byte](payload.length / 2 + 32)
    out += 0x1f.toByte += 0x8b.toByte += 8 += (if (fname.isDefined) 8 else 0).toByte
    out += 0 += 0 += 0 += 0 // MTIME
    out += 0 += 0xff.toByte // XFL, OS=unknown
    fname.foreach { n =>
      val b = n.getBytes(UTF_8)
      require(!b.contains(0.toByte), "FNAME cannot hold NUL")
      out ++= b += 0
    }
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.take(n)
    }
    d.end()
    val crc = new CRC32
    crc.update(payload)
    var v = crc.getValue
    var i = 0
    while (i < 4) { out += (v & 0xff).toByte; v >>>= 8; i += 1 }
    var isize = payload.length.toLong & 0xffffffffL
    i = 0
    while (i < 4) { out += (isize & 0xff).toByte; isize >>>= 8; i += 1 }
    out.toArray
  }

  // ---- decode -----------------------------------------------------------------

  /** Strict walk of a (possibly multi-member) gzip stream. */
  def parseMembers(docId: Long, b: Array[Byte]): Vector[Member] = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: GZIP parse at byte $off: $why")
    def u16(p: Int): Int = {
      if (p + 2 > b.length) fail(p.toLong, "truncated u16")
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Long = {
      if (p + 4 > b.length) fail(p.toLong, "truncated u32")
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    val members = Vector.newBuilder[Member]
    var pos = 0
    if (b.isEmpty) fail(0L, "empty stream")
    while (pos < b.length) {
      val start = pos.toLong
      if (pos + 10 > b.length) fail(start, "truncated member header")
      if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b)
        fail(start, f"bad magic 0x${b(pos) & 0xff}%02x${b(pos + 1) & 0xff}%02x")
      if (b(pos + 2) != 8) fail(start + 2, s"compression method ${b(pos + 2)} is not deflate")
      val flg = b(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) fail(start + 3, f"reserved FLG bits set (0x$flg%02x)")
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = u16(p)
        p += 2 + xlen
        if (p > b.length) fail(start, "FEXTRA crosses the stream end")
      }
      var fname: Option[String] = None
      if ((flg & 8) != 0) { // FNAME
        val s = p
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) fail(s.toLong, "unterminated FNAME")
        fname = Some(new String(b, s, p - s, UTF_8))
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        val s = p
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) fail(s.toLong, "unterminated FCOMMENT")
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC: crc16 of everything before it
        val crc = new CRC32
        crc.update(b, pos, p - pos)
        val want = (crc.getValue & 0xffffL).toInt
        if (u16(p) != want) fail(p.toLong, f"header CRC16 mismatch (0x${u16(p)}%04x != 0x$want%04x)")
        p += 2
      }
      // deflate stream with exact input tracking
      val inf = new Inflater(true)
      inf.setInput(b, p, b.length - p)
      val out = new ArrayBuffer[Byte](256)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException => inf.end(); fail(p.toLong, s"bad DEFLATE stream: ${e.getMessage}") }
        if (n == 0 && !inf.finished()) { inf.end(); fail(p.toLong, "DEFLATE stream truncated") }
        out ++= buf.take(n)
      }
      val consumed = (b.length - p) - inf.getRemaining
      inf.end()
      val payload = out.toArray
      val tp = p + consumed
      if (tp + 8 > b.length) fail(tp.toLong, "truncated member trailer")
      val crc = new CRC32
      crc.update(payload)
      if (u32(tp) != crc.getValue)
        fail(tp.toLong, f"trailer crc 0x${u32(tp)}%08x != computed 0x${crc.getValue}%08x")
      if (u32(tp + 4) != (payload.length.toLong & 0xffffffffL))
        fail(tp.toLong + 4, s"trailer ISIZE ${u32(tp + 4)} != decompressed ${payload.length}")
      pos = tp + 8
      members += Member(payload, fname, start, pos.toLong)
    }
    members.result()
  }

  // ---- the oracle-gated query --------------------------------------------------

  private val PerShard = 16

  /** Documents → `.jsonl.gz` shards (one strict-escaped JSON object per
    * line, full text included) → hand-rolled gzip walk back → every
    * line through the strict JSON parser. Gates the member census, the
    * per-line roundtrip of id/lang/text, and the exact uncompressed
    * byte count the trailer vouched for.
    */
  val q_jsonl_gz: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS shard, text, lang FROM documents)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n_lines,
       |  lang AS lang_rt,
       |  md5(text) AS text_md5
       |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2"), col("lang").as("_3")))).as("docs"))
      .as[(Long, Seq[(Long, String, String)])]
      .flatMap { case (shard, docs) =>
        val md = MessageDigest.getInstance("MD5")
        val jsonl = docs.map { case (id, text, lang) =>
          s"""{"doc_id":$id,"lang":"${Safetensors.jsonEscape(lang)}","text":"${Safetensors.jsonEscape(text)}"}"""
        }.mkString("", "\n", "\n").getBytes(UTF_8)
        val gz = encodeMember(jsonl, Some(f"shard-$shard%05d.jsonl"))
        val members = parseMembers(shard, gz)
        require(members.size == 1 && members.head.fname.contains(f"shard-$shard%05d.jsonl"),
          s"shard $shard: member census ${members.map(_.fname)}")
        val back = members.head.payload
        require(java.util.Arrays.equals(back, jsonl),
          s"shard $shard: decompressed payload differs from input")
        val lines = new String(back, UTF_8).split("\n", -1).dropRight(1)
        require(lines.length == docs.size, s"shard $shard: ${lines.length} lines for ${docs.size} docs")
        lines.map { line =>
          val o = Safetensors.parseJson(shard, line, 0L) match {
            case o: Safetensors.JObj => o
            case _ => throw new IllegalArgumentException(s"shard $shard: line is not a JSON object")
          }
          val id = o.get("doc_id") match { case Some(Safetensors.JNum(v)) => v; case _ => sys.error("doc_id") }
          val lang = o.get("lang") match { case Some(Safetensors.JStr(v)) => v; case _ => sys.error("lang") }
          val text = o.get("text") match { case Some(Safetensors.JStr(v)) => v; case _ => sys.error("text") }
          md.reset()
          val hex = md.digest(text.getBytes(UTF_8)).map("%02x".format(_)).mkString
          (id, shard, docs.size.toLong, lang, hex)
        }.toSeq
      }
      .toDF("doc_id", "shard", "n_lines", "lang_rt", "text_md5")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_jsonl_gz" -> q_jsonl_gz)
}
