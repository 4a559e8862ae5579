package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.zip.{CRC32, Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** PKZIP (APPNOTE) archives — the OTHER dataset container next to TAR
  * (H73): Kaggle dumps, HuggingFace zips, and NumPy `.npz` shards all
  * ride the ZIP format. Both halves hand-rolled and byte-exact against
  * the public APPNOTE.TXT layout: the writer emits local file headers
  * (sig PK\3\4, version 2.0, STORED or DEFLATE via the JDK's raw
  * [[Deflater]]), a central directory (PK\1\2 entries carrying the
  * authoritative crc/sizes/offsets) and the end-of-central-directory
  * record (PK\5\6); the reader locates the EOCD by the strict
  * comment-length back-scan, walks the central directory, verifies
  * every local header against its central entry, inflates DEFLATE
  * entries through a raw [[Inflater]] and VERIFIES crc-32 + both sizes
  * for every payload. Data-descriptor entries (flag bit 3 — what
  * `java.util.zip.ZipOutputStream` writes for DEFLATE) are read via the
  * central sizes and the trailing descriptor is cross-checked. A bad
  * signature, a central/local disagreement, a crc or size mismatch, an
  * unsupported method, or a directory walk not landing exactly on the
  * EOCD each fail LOUDLY with the byte offset (the MediaDecoder
  * contract) — a zip reader that trusts local headers alone mis-frames
  * every entry after the first lie.
  *
  * [[q_zip_shard]] gates the whole path: 8 documents per shard, the
  * `.txt` halves STORED first (so their data offsets are closed-form
  * header arithmetic the oracle recomputes as a running sum — the same
  * random-access index math an `.npz`/Kaggle reader does), the `.meta`
  * halves DEFLATE-compressed after them (so the inflate+crc path is on
  * the gated roundtrip).
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode+parse pass, zero further shuffles — embarrassingly parallel
  * over shards, exactly how zip corpora are processed.
  */
object Zip {

  /** One entry to write: STORED when `deflate` is false. */
  final case class Spec(name: String, payload: Array[Byte], deflate: Boolean)

  /** One parsed entry: name, verified payload, where its DATA starts,
    * and the method it was stored with (0 = STORED, 8 = DEFLATE).
    */
  final case class Entry(name: String, payload: Array[Byte], dataOffset: Long, method: Int)

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50
  private val DescSig = 0x08074b50

  // ---- encode -----------------------------------------------------------------

  private def le16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >>> 8) & 0xff).toByte
  }
  private def le32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte; out += ((v >>> 8) & 0xff).toByte
    out += ((v >>> 16) & 0xff).toByte; out += ((v >>> 24) & 0xff).toByte
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new ArrayBuffer[Byte](b.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.take(n)
    }
    d.end()
    out.toArray
  }

  /** Encode entries as a ZIP archive: local headers + data, then the
    * central directory, then EOCD. Fixed DOS timestamp (1980-01-01),
    * crc/sizes in the local header (no data descriptors).
    */
  def encodeZip(entries: Seq[Spec]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](1024)
    // (name, crc, csize, usize, method, localOffset)
    val dir = new ArrayBuffer[(Array[Byte], Long, Int, Int, Int, Int)](entries.size)
    entries.foreach { case Spec(name, payload, deflate) =>
      val nameB = name.getBytes(UTF_8)
      require(nameB.length <= 0xffff, s"name '$name' too long")
      val crc = new CRC32
      crc.update(payload)
      val data = if (deflate) deflateRaw(payload) else payload
      val method = if (deflate) 8 else 0
      val off = out.length
      le32(out, LocalSig); le16(out, 20); le16(out, 0); le16(out, method)
      le16(out, 0); le16(out, 0x21) // DOS time 00:00:00, date 1980-01-01
      le32(out, crc.getValue); le32(out, data.length.toLong)
      le32(out, payload.length.toLong)
      le16(out, nameB.length); le16(out, 0)
      out ++= nameB
      out ++= data
      dir += ((nameB, crc.getValue, data.length, payload.length, method, off))
    }
    val cdStart = out.length
    dir.foreach { case (nameB, crc, csize, usize, method, off) =>
      le32(out, CentralSig); le16(out, 20); le16(out, 20); le16(out, 0)
      le16(out, method); le16(out, 0); le16(out, 0x21)
      le32(out, crc); le32(out, csize.toLong); le32(out, usize.toLong)
      le16(out, nameB.length); le16(out, 0); le16(out, 0)
      le16(out, 0); le16(out, 0); le32(out, 0L); le32(out, off.toLong)
      out ++= nameB
    }
    val cdSize = out.length - cdStart
    le32(out, EocdSig); le16(out, 0); le16(out, 0)
    le16(out, dir.length); le16(out, dir.length)
    le32(out, cdSize.toLong); le32(out, cdStart.toLong); le16(out, 0)
    out.toArray
  }

  // ---- decode -----------------------------------------------------------------

  private final class Reader(docId: Long, b: Array[Byte]) {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: ZIP parse at byte $off: $why")
    def u16(p: Int): Int = {
      if (p + 2 > b.length) fail(p.toLong, "truncated u16")
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Long = {
      if (p + 4 > b.length) fail(p.toLong, "truncated u32")
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    def u64(p: Int): Long = {
      if (p + 8 > b.length) fail(p.toLong, "truncated u64")
      u32(p) | (u32(p + 4) << 32)
    }
    /** (uncompressed, compressed) from a zip64 extended-information extra
      * field (tag 0x0001) in the extra region at [p, p+len), if present.
      */
    def zip64Sizes(p: Int, len: Int): Option[(Long, Long)] = {
      var q = p
      val end = p + len
      while (q + 4 <= end) {
        val tag = u16(q)
        val sz = u16(q + 2)
        if (q + 4 + sz > end) fail(q.toLong + 2, "extra field crosses the extra region")
        if (tag == 0x0001) {
          if (sz < 16) fail(q.toLong, s"zip64 extra of $sz bytes cannot hold both sizes")
          return Some((u64(q + 4), u64(q + 12)))
        }
        q += 4 + sz
      }
      None
    }
  }

  /** Walk + verify + extract every entry, central-directory-driven. */
  def parseZip(docId: Long, b: Array[Byte]): Vector[Entry] = {
    val r = new Reader(docId, b)
    import r._
    if (b.length < 22) fail(0L, s"file of ${b.length} bytes cannot hold an EOCD")
    // EOCD back-scan: the record whose comment-length field spans exactly
    // the remaining bytes. Scanning comment lengths upward finds the LAST
    // signature in the file — the true EOCD (a fake would have to sit
    // inside the comment, after it).
    val maxComment = math.min(0xffff, b.length - 22)
    var eocd = -1
    var c = 0
    while (eocd < 0 && c <= maxComment) {
      val p = b.length - 22 - c
      if (u32(p) == EocdSig && u16(p + 20) == c) eocd = p
      c += 1
    }
    if (eocd < 0) fail(b.length.toLong, "no end-of-central-directory record")
    if (u16(eocd + 4) != 0 || u16(eocd + 6) != 0)
      fail(eocd.toLong + 4, "multi-disk archives unsupported")
    val nHere = u16(eocd + 8)
    val nTotal = u16(eocd + 10)
    if (nHere != nTotal) fail(eocd.toLong + 8, s"entry counts disagree ($nHere vs $nTotal)")
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    if (cdOff + cdSize != eocd.toLong)
      fail(eocd.toLong + 12, s"central directory [$cdOff,+$cdSize) does not abut the EOCD at $eocd")
    // walk the central directory
    var pos = cdOff.toInt
    val entries = Vector.newBuilder[Entry]
    var i = 0
    while (i < nTotal) {
      val at = pos.toLong
      if (u32(pos) != CentralSig) fail(at, f"bad central-directory signature 0x${u32(pos)}%08x")
      val flags = u16(pos + 8)
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      val csize = u32(pos + 20)
      val usize = u32(pos + 24)
      val nlen = u16(pos + 28)
      val xlen = u16(pos + 30)
      val clen = u16(pos + 32)
      val lho = u32(pos + 42)
      if (pos + 46 + nlen > b.length) fail(at + 28, "central entry name truncated")
      val name = new String(b, pos + 46, nlen, UTF_8)
      if (method != 0 && method != 8) fail(at + 10, s"compression method $method unsupported")
      if (csize > Int.MaxValue || usize > Int.MaxValue) fail(at + 20, "zip64 sizes unsupported")
      // the matching local header
      val lp = lho.toInt
      if (lho + 30 > cdOff) fail(at + 42, s"local header offset $lho crosses the central directory")
      if (u32(lp) != LocalSig) fail(lho, f"bad local-header signature 0x${u32(lp)}%08x")
      val lnlen = u16(lp + 26)
      val lxlen = u16(lp + 28)
      val lname = new String(b, lp + 30, lnlen, UTF_8)
      if (lname != name) fail(lho + 30, s"local name '$lname' != central name '$name'")
      if (u16(lp + 8) != method) fail(lho + 8, "local/central method disagree")
      if ((flags & (1 << 3)) == 0) {
        // sizes present in the local header: must agree with central
        if (u32(lp + 14) != crc) fail(lho + 14, "local/central crc disagree")
        val lcs = u32(lp + 18)
        val lus = u32(lp + 22)
        if (lcs == 0xffffffffL || lus == 0xffffffffL) {
          // zip64 placeholder (what python's zipfile / numpy.savez writes
          // on a streaming member): real u64 sizes live in the local
          // zip64 extended-information extra field
          val (z64u, z64c) = zip64Sizes(lp + 30 + lnlen, lxlen).getOrElse(
            fail(lho + 18, "zip64 size placeholder without a zip64 extra field"))
          if (z64c != csize) fail(lho + 18, s"zip64-extra compressed size $z64c != central $csize")
          if (z64u != usize) fail(lho + 22, s"zip64-extra uncompressed size $z64u != central $usize")
        } else {
          if (lcs != csize) fail(lho + 18, "local/central compressed size disagree")
          if (lus != usize) fail(lho + 22, "local/central uncompressed size disagree")
        }
      }
      val dataAt = lp + 30 + lnlen + lxlen
      if (dataAt + csize > cdOff) fail(dataAt.toLong, s"entry data of $csize bytes crosses the central directory")
      val raw = java.util.Arrays.copyOfRange(b, dataAt, dataAt + csize.toInt)
      val payload =
        if (method == 0) {
          if (csize != usize) fail(at + 20, s"STORED entry with csize $csize != usize $usize")
          raw
        } else {
          // inflate into usize+1 bytes: one spare slot proves the stream
          // does not yield MORE than the declared size
          val inf = new Inflater(true)
          inf.setInput(raw)
          val outB = new Array[Byte](usize.toInt + 1)
          var total = 0
          var done = false
          while (!done) {
            val n =
              try inf.inflate(outB, total, outB.length - total)
              catch { case e: java.util.zip.DataFormatException => inf.end(); fail(dataAt.toLong, s"bad DEFLATE stream: ${e.getMessage}") }
            total += n
            if (inf.finished()) done = true
            else if (n == 0) { inf.end(); fail(dataAt.toLong, "DEFLATE stream stalled or truncated") }
            else if (total == outB.length) { inf.end(); fail(dataAt.toLong, s"DEFLATE stream yields more than the declared $usize bytes") }
          }
          if (total != usize) { inf.end(); fail(dataAt.toLong, s"DEFLATE stream yielded $total bytes, declared $usize") }
          if (inf.getRemaining != 0) { inf.end(); fail(dataAt.toLong, "trailing bytes after the DEFLATE stream inside the compressed extent") }
          inf.end()
          java.util.Arrays.copyOfRange(outB, 0, usize.toInt)
        }
      val check = new CRC32
      check.update(payload)
      if (check.getValue != crc) fail(dataAt.toLong, f"crc mismatch: 0x${check.getValue}%08x != recorded 0x$crc%08x")
      if ((flags & (1 << 3)) != 0) {
        // data descriptor follows the data; the spec allows an optional sig
        var dp = dataAt + csize.toInt
        if (u32(dp) == DescSig) dp += 4
        if (u32(dp) != crc) fail(dp.toLong, "data-descriptor crc disagrees with central directory")
        if (u32(dp + 4) != csize) fail(dp.toLong + 4, "data-descriptor compressed size disagrees")
        if (u32(dp + 8) != usize) fail(dp.toLong + 8, "data-descriptor uncompressed size disagrees")
      }
      entries += Entry(name, payload, dataAt.toLong, method)
      pos += 46 + nlen + xlen + clen
      i += 1
    }
    if (pos.toLong != cdOff + cdSize)
      fail(pos.toLong, s"central directory walk ended at $pos, expected ${cdOff + cdSize}")
    entries.result()
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val PerShard = 8

  /** Documents → ZIP shards (all `.txt` halves STORED first, then the
    * `.meta` halves DEFLATEd) → real parse back. `txt_offset` is the
    * random-access index math — 30-byte local header + name, summed over
    * the stored prefix — recomputed closed-form by the oracle; the
    * `.meta` roundtrip (lang + source) gates the inflate+crc path.
    */
  val q_zip_shard: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS shard, text, lang, source,
       |    octet_length(encode(text)) AS plen,
       |    length(CAST(doc_id AS VARCHAR)) + 4 AS nlen
       |  FROM documents)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) OVER (PARTITION BY shard) * 2 AS BIGINT) AS n_entries,
       |  CAST(plen AS BIGINT) AS txt_len,
       |  md5(text) AS txt_md5,
       |  CAST(coalesce(sum(30 + nlen + plen) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 30 + nlen AS BIGINT) AS txt_offset,
       |  lang AS lang_rt, source AS source_rt
       |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2"), col("lang").as("_3"), col("source").as("_4")))).as("docs"))
      .as[(Long, Seq[(Long, String, String, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (shard, docs) =>
          // stored .txt entries first: their offsets stay closed-form
          val specs =
            docs.map { case (id, text, _, _) => Spec(s"$id.txt", text.getBytes(UTF_8), deflate = false) } ++
              docs.map { case (id, _, lang, source) => Spec(s"$id.meta", s"$lang\t$source".getBytes(UTF_8), deflate = true) }
          val parsed = parseTarget(shard, specs)
          val byName = parsed.map(e => e.name -> e).toMap
          docs.map { case (id, _, _, _) =>
            val txt = byName(s"$id.txt")
            val meta = byName(s"$id.meta")
            md.reset()
            val hex = md.digest(txt.payload).map("%02x".format(_)).mkString
            val Array(langRt, sourceRt) = new String(meta.payload, UTF_8).split("\t", 2)
            (id, shard, parsed.size.toLong, txt.payload.length.toLong, hex,
              txt.dataOffset, langRt, sourceRt)
          }
        }
      }
      .toDF("doc_id", "shard", "n_entries", "txt_len", "txt_md5", "txt_offset",
        "lang_rt", "source_rt")
      .orderBy(col("doc_id"))
  }

  private def parseTarget(shard: Long, specs: Seq[Spec]): Vector[Entry] =
    parseZip(shard, encodeZip(specs))

  val all: Map[String, QueryDef] = Map("q_zip_shard" -> q_zip_shard)
}
