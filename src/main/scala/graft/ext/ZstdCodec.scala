package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Zstandard (RFC 8878) shard round-trip — the compression modern LLM
  * corpora actually ship in (`.jsonl.zst` interchange shards,
  * `.warc.zst` crawls): text shards are compressed through the REAL
  * zstd codec (zstd-jni, the same native library Spark's own shuffle
  * compression uses), and read back through BOTH an independent
  * bit-level FRAME WALK of ours and the real decompressor.
  *
  * The walk parses the RFC 8878 container skeleton — magic, the
  * Frame_Header_Descriptor bit fields (frame-content-size code,
  * single-segment, checksum, dictionary-id flags, the reserved bit),
  * window descriptor, the little-endian FCS field in all four widths,
  * then every Block_Header (last-block bit, type, 21-bit size; RLE
  * blocks consume ONE byte regardless of their regenerated size — the
  * trap in naive walkers), the checksum trailer, and multi-frame
  * concatenation including skippable frames (0x184D2A5? magic) — the
  * layout `.warc.zst` readers must navigate for random access. Bad
  * magic, a set reserved bit, a truncated header/block/trailer, or a
  * dictionary requirement each fail LOUDLY with the byte offset (the
  * MediaDecoder contract); entropy decoding itself is delegated to the
  * real library, whose output the oracle gates by md5.
  *
  * [[q_zstd_shard]] gates the whole path: 8 documents per shard as
  * newline-terminated lines, one zstd frame per shard, the walked
  * frame-content-size (exactly the sum of line byte lengths — the
  * single-shot encoder always records FCS) and the per-line md5 after
  * REAL decompression recomputed closed-form by DuckDB.
  *
  * Scale shape: one bounded per-shard aggregation + one mapPartitions
  * compress/walk/decompress pass, zero further shuffles —
  * embarrassingly parallel over shards, exactly how `.jsonl.zst`
  * corpora are processed.
  */
object ZstdCodec {

  /** One parsed frame: content size from the header (-1 when absent),
    * checksum flag, block count, byte extent in the stream, whether it
    * was a skippable frame, and the dictionary id the frame requires
    * (0 = none — only nonzero when the walk was told to allow them).
    */
  final case class Frame(offset: Long, byteLen: Int, contentSize: Long,
      hasChecksum: Boolean, nBlocks: Int, skippable: Boolean,
      dictId: Long = 0L)

  private val Magic = 0xfd2fb528L
  private val SkippableBase = 0x184d2a50L

  /** Walk a (possibly multi-frame) zstd stream's container skeleton.
    * `allowDict = false` (the default) keeps the fail-loud contract for
    * readers with no dictionary in hand — decompressing such a frame
    * without its dict is impossible, so guessing would mis-frame; a
    * dictionary-aware reader passes `allowDict = true` and gets the
    * required id in [[Frame.dictId]] to resolve the dict itself.
    */
  def parseZstd(docId: Long, b: Array[Byte],
      allowDict: Boolean = false): Vector[Frame] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: zstd parse at byte $off: $why")
    def le32(p: Int): Long = {
      if (p + 4 > b.length) fail(p, "truncated 32-bit field")
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    def leN(p: Int, n: Int): Long = {
      if (p + n > b.length) fail(p, s"truncated $n-byte field")
      var v = 0L
      var i = 0
      while (i < n) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    if (b.isEmpty) fail(0, "empty stream (no frame)")
    val frames = Vector.newBuilder[Frame]
    var pos = 0
    while (pos < b.length) {
      val at = pos
      val magic = le32(pos)
      pos += 4
      if ((magic & 0xfffffff0L) == SkippableBase) {
        // skippable frame: LE32 size + opaque content
        val sz = le32(pos)
        pos += 4
        if (sz > b.length.toLong - pos) fail(at, s"skippable frame of $sz bytes truncated")
        pos += sz.toInt
        frames += Frame(at.toLong, pos - at, sz, hasChecksum = false, 0, skippable = true)
      } else if (magic == Magic) {
        if (pos >= b.length) fail(pos, "truncated frame header descriptor")
        val fhd = b(pos) & 0xff
        pos += 1
        if ((fhd & 0x08) != 0) fail(at + 4, "reserved FHD bit set")
        val singleSegment = (fhd & 0x20) != 0
        val hasChecksum = (fhd & 0x04) != 0
        val dictIdBytes = (fhd & 0x03) match {
          case 0 => 0
          case 1 => 1
          case 2 => 2
          case 3 => 4
        }
        if (!singleSegment) {
          if (pos >= b.length) fail(pos, "truncated window descriptor")
          pos += 1
        }
        var dictId = 0L
        if (dictIdBytes > 0) {
          dictId = leN(pos, dictIdBytes)
          pos += dictIdBytes
          if (dictId != 0 && !allowDict)
            fail(at, s"frame requires dictionary $dictId (no dictionary in hand)")
        }
        val fcsCode = (fhd >>> 6) & 0x03
        val contentSize = fcsCode match {
          case 0 =>
            // 1-byte field only in single-segment mode; otherwise absent
            if (singleSegment) { val v = leN(pos, 1); pos += 1; v } else -1L
          case 1 => val v = leN(pos, 2) + 256L; pos += 2; v
          case 2 => val v = leN(pos, 4); pos += 4; v
          case 3 => val v = leN(pos, 8); pos += 8; v
        }
        // block walk: 3-byte headers; RLE payload is ONE byte
        var nBlocks = 0
        var last = false
        while (!last) {
          val h = leN(pos, 3)
          pos += 3
          last = (h & 1L) != 0
          val btype = ((h >>> 1) & 0x3L).toInt
          val bsize = (h >>> 3).toInt
          val consumed = btype match {
            case 0 => bsize // raw
            case 1 => 1 // RLE: one byte regenerates bsize copies
            case 2 => bsize // compressed
            case 3 => fail(pos - 3, "reserved block type")
          }
          if (consumed > b.length - pos) fail(pos - 3, s"block of $consumed bytes truncated")
          pos += consumed
          nBlocks += 1
        }
        if (hasChecksum) {
          if (pos + 4 > b.length) fail(pos, "truncated content checksum")
          pos += 4
        }
        frames += Frame(at.toLong, pos - at, contentSize, hasChecksum, nBlocks,
          skippable = false, dictId = dictId)
      } else fail(at, f"bad zstd magic 0x$magic%08x")
    }
    frames.result()
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val PerShard = 8
  private val Level = 3

  /** Documents → newline-terminated lines → one REAL zstd frame per
    * shard → our frame walk (content size, framing) + REAL decompression
    * (line payloads) — every gated column closed-form in the documents
    * table. Block count and compressed size are encoder-dependent and
    * deliberately NOT gated (ZstdSpec bounds them instead).
    */
  val q_zstd_shard: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS shard, text,
       |    octet_length(encode(text)) AS plen
       |  FROM documents)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n_lines,
       |  CAST(sum(plen + 1) OVER (PARTITION BY shard) AS BIGINT) AS content_size,
       |  md5(text) AS line_md5
       |FROM d
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("text").as("_2")))).as("docs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (shard, docs) =>
          // the newline-terminated line framing (and its sum(plen+1)
          // oracle) requires newline-free documents; assert the
          // invariant at encode time rather than failing obscurely in
          // the post-decompress line-count check
          docs.foreach { case (id, text) =>
            if (text.indexOf('\n') >= 0) throw new IllegalArgumentException(
              s"doc $id: embedded newline breaks the shard's line framing; " +
                "strip or escape newlines before zstd sharding")
          }
          val payload = docs.map(_._2 + "\n").mkString.getBytes(UTF_8)
          val zst = com.github.luben.zstd.Zstd.compress(payload, Level)
          val frames = parseZstd(shard, zst)
          if (frames.size != 1 || frames.head.skippable)
            throw new IllegalStateException(
              s"shard $shard: expected one data frame, got $frames")
          val f = frames.head
          if (f.contentSize != payload.length)
            throw new IllegalStateException(
              s"shard $shard: walked FCS ${f.contentSize} != ${payload.length}")
          // the REAL decompressor, sized by OUR walked content size
          val back = com.github.luben.zstd.Zstd.decompress(zst, f.contentSize.toInt)
          val lines = new String(back, UTF_8).split("\n", -1).init
          if (lines.length != docs.size)
            throw new IllegalStateException(
              s"shard $shard: ${docs.size} lines in, ${lines.length} out")
          docs.zip(lines).map { case ((id, _), line) =>
            md.reset()
            val hex = md.digest(line.getBytes(UTF_8)).map("%02x".format(_)).mkString
            (id, shard, docs.size.toLong, f.contentSize, hex)
          }
        }
      }
      .toDF("doc_id", "shard", "n_lines", "content_size", "line_md5")
      .orderBy(col("doc_id"))
  }

  // ---- .warc.zst: zstd-member WARC, the modern crawl layout ---------------------

  /** One WARC record's bytes (headers + payload + record separator) —
    * the unit each `.warc.zst` frame compresses.
    */
  private def warcRecordBytes(uri: String, id: String,
      payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append("\r\n")
      .append("WARC-Type: response").append("\r\n")
      .append("WARC-Record-ID: ").append(id).append("\r\n")
      .append("WARC-Target-URI: ").append(uri).append("\r\n")
      .append("Content-Length: ").append(payload.length).append("\r\n")
      .append("\r\n")
    head.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  /** Encode WARC records frame-per-record (the random-access `.warc.zst`
    * layout: one zstd frame per record, so a CDX offset seeks to a frame
    * boundary), with a trailing SKIPPABLE frame carrying the index blob —
    * readers must skip it, not choke on it.
    */
  def encodeWarcZst(records: Seq[(String, String, Array[Byte])],
      index: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (uri, id, payload) =>
      val z = com.github.luben.zstd.Zstd.compress(warcRecordBytes(uri, id, payload), Level)
      out.write(z, 0, z.length)
    }
    // skippable frame: LE magic 0x184D2A50, LE32 size, opaque index
    le32(out, SkippableBase)
    le32(out, index.length.toLong)
    out.write(index, 0, index.length)
    out.toByteArray
  }

  // ---- zstd SEEKABLE format (public spec: zstd contrib "Zstandard ---------------
  // Seekable Format", version 0.1.0) — the standard seek index a
  // production reader uses to fetch record N from a 100 TB crawl shard
  // without decompressing the shard prefix.

  /** The seek table rides the skippable magic variant 0xE. */
  private val SeekTableMagic = SkippableBase | 0xeL
  /** The footer's own magic — the LAST 4 bytes of a seekable file. */
  private val SeekableFooterMagic = 0x8f92eab1L

  /** One seek-table entry: the frame's compressed and decompressed size. */
  final case class SeekEntry(compressedSize: Int, decompressedSize: Int)

  /** Append the standard seek table as a skippable frame: per-frame
    * (compressed, decompressed) LE32 pairs, then the 9-byte footer —
    * Number_Of_Frames | Seek_Table_Descriptor | 0x8F92EAB1 — parsed
    * from the END of the file (that is the whole point: a reader
    * fetches the last bytes of the object, never the prefix).
    */
  def writeSeekTable(out: java.io.ByteArrayOutputStream,
      entries: Seq[SeekEntry]): Unit = {
    le32(out, SeekTableMagic)
    le32(out, entries.size.toLong * 8L + 9L)
    entries.foreach { e =>
      le32(out, e.compressedSize.toLong)
      le32(out, e.decompressedSize.toLong)
    }
    le32(out, entries.size.toLong)
    out.write(0) // descriptor: no per-frame checksums, reserved bits clear
    le32(out, SeekableFooterMagic)
  }

  /** Parse the seek table from the file END (footer-first — no frame
    * walk, no prefix read past the table itself). Fails loudly on a
    * missing/corrupt footer, set reserved descriptor bits, a skippable
    * header that disagrees with the footer's frame count, or entries
    * that don't cover exactly the bytes before the table.
    */
  def parseSeekTable(docId: Long, b: Array[Byte]): Vector[SeekEntry] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: zstd seek-table parse at byte $off: $why")
    def le32At(p: Int): Long = {
      if (p < 0 || p + 4 > b.length) fail(math.max(p, 0), "truncated 32-bit field")
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    if (b.length < 17) fail(0, "too short for a seekable footer")
    if (le32At(b.length - 4) != SeekableFooterMagic)
      fail(b.length - 4, f"bad seekable footer magic (want 0x$SeekableFooterMagic%08x)")
    val desc = b(b.length - 5) & 0xff
    if ((desc & 0x7c) != 0) fail(b.length - 5, f"reserved descriptor bits set (0x$desc%02x)")
    val checksums = (desc & 0x80) != 0
    val entrySize = if (checksums) 12 else 8
    val nFrames = le32At(b.length - 9)
    if (nFrames < 0 || nFrames > (b.length - 17) / entrySize)
      fail(b.length - 9, s"frame count $nFrames inconsistent with file size")
    val tableContent = nFrames * entrySize + 9
    val hdrPos = b.length - 9 - nFrames.toInt * entrySize - 8
    if (hdrPos < 0) fail(0, "seek table larger than the file")
    if (le32At(hdrPos) != SeekTableMagic)
      fail(hdrPos, f"seek table skippable magic missing (want 0x$SeekTableMagic%08x)")
    if (le32At(hdrPos + 4) != tableContent)
      fail(hdrPos + 4, s"skippable size ${le32At(hdrPos + 4)} != table content $tableContent")
    val entries = Vector.tabulate(nFrames.toInt) { i =>
      val p = hdrPos + 8 + i * entrySize
      SeekEntry(le32At(p).toInt, le32At(p + 4).toInt)
    }
    val covered = entries.foldLeft(0L)(_ + _.compressedSize)
    if (covered != hdrPos)
      fail(0, s"entries cover $covered bytes but $hdrPos precede the table")
    entries
  }

  /** Fetch ONE frame by seek-table position: slices exactly
    * [offset, offset+compressedSize) out of the shard — the bytes of
    * every other frame are never even handed to the decompressor (the
    * ZstdSpec leg corrupts them all and this still succeeds) — and
    * decompresses it sized by the table's decompressed size.
    */
  def seekFetch(docId: Long, b: Array[Byte], entries: Vector[SeekEntry],
      n: Int): Array[Byte] = {
    if (n < 0 || n >= entries.size) throw new IllegalArgumentException(
      s"doc $docId: seek fetch of frame $n outside table of ${entries.size}")
    var off = 0L
    var i = 0
    while (i < n) { off += entries(i).compressedSize; i += 1 }
    val e = entries(n)
    val frame = java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + e.compressedSize)
    com.github.luben.zstd.Zstd.decompress(frame, e.decompressedSize)
  }

  /** Encode WARC records frame-per-record and append the STANDARD
    * seekable-format seek table (not an opaque blob): the layout a
    * reader random-accesses with [[parseSeekTable]] + [[seekFetch]].
    */
  def encodeWarcZstSeekable(
      records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val entries = records.map { case (uri, id, payload) =>
      val rec = warcRecordBytes(uri, id, payload)
      val z = com.github.luben.zstd.Zstd.compress(rec, Level)
      out.write(z, 0, z.length)
      SeekEntry(z.length, rec.length)
    }
    writeSeekTable(out, entries)
    out.toByteArray
  }

  /** Walk the frames (skippables ignored), decompress each data frame by
    * its OWN walked content size, then run the shared Content-Length
    * record framing over the concatenation. Returns the records plus the
    * frame census (data frames, skippable frames).
    */
  def parseWarcZst(docId: Long, b: Array[Byte]): (Vector[Warc.Record], Int, Int) = {
    val frames = parseZstd(docId, b)
    val out = new java.io.ByteArrayOutputStream()
    var data = 0
    var skip = 0
    frames.foreach { f =>
      if (f.skippable) skip += 1
      else {
        if (f.contentSize < 0) throw new IllegalArgumentException(
          s"doc $docId: zstd parse at byte ${f.offset}: frame without content size (streaming frame) unsupported in .warc.zst")
        val frame = java.util.Arrays.copyOfRange(b, f.offset.toInt,
          f.offset.toInt + f.byteLen)
        val dec = com.github.luben.zstd.Zstd.decompress(frame, f.contentSize.toInt)
        out.write(dec, 0, dec.length)
        data += 1
      }
    }
    (Warc.parseWarcRecords(docId, out.toByteArray), data, skip)
  }

  /** The H71 × H77 compose: documents → frame-per-record `.warc.zst`
    * (with a trailing skippable index frame) → frame walk + REAL
    * decompression + the verified Content-Length framing. The oracle is
    * the SAME decompressed-offset arithmetic as `q_warc_roundtrip` —
    * compression never changes the CDX math — plus the closed-form frame
    * census (one data frame per record, one skippable).
    */
  val q_warc_zst: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS wf, text,
       |    octet_length(encode(text)) AS plen,
       |    'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       |    'urn:doc:' || CAST(doc_id AS VARCHAR) AS rid
       |  FROM documents),
       |z AS (SELECT *, ${Warc.RecFixed} + length(rid) + length(uri)
       |    + length(CAST(plen AS VARCHAR)) + plen AS rec_bytes
       |  FROM d)
       |SELECT doc_id, CAST(wf AS BIGINT) AS warc_file, uri,
       |  CAST(count(*) OVER (PARTITION BY wf) AS BIGINT) AS n_records,
       |  CAST(count(*) OVER (PARTITION BY wf) + 1 AS BIGINT) AS n_frames,
       |  CAST(plen AS BIGINT) AS content_length,
       |  md5(text) AS payload_md5,
       |  CAST(coalesce(sum(rec_bytes) OVER (PARTITION BY wf ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset
       |FROM z
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("wf"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("text").as("_2")))).as("docs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (wf, docs) =>
          val recs = docs.map { case (id, text) =>
            (s"https://example.org/doc/$id", s"urn:doc:$id", text.getBytes(UTF_8))
          }
          val zst = encodeWarcZst(recs, s"cdx index for $wf".getBytes(UTF_8))
          val (parsed, dataFrames, skipFrames) = parseWarcZst(wf, zst)
          if (parsed.size != docs.size || dataFrames != docs.size || skipFrames != 1)
            throw new IllegalStateException(
              s"warc.zst $wf: ${docs.size} in, ${parsed.size} out ($dataFrames data, $skipFrames skippable)")
          parsed.map { r =>
            md.reset()
            val hex = md.digest(r.payload).map("%02x".format(_)).mkString
            val docId = r.uri.substring(r.uri.lastIndexOf('/') + 1).toLong
            (docId, wf, r.uri, parsed.size.toLong, parsed.size.toLong + 1,
              r.contentLength.toLong, hex, r.offset)
          }
        }
      }
      .toDF("doc_id", "warc_file", "uri", "n_records", "n_frames",
        "content_length", "payload_md5", "rec_offset")
      .orderBy(col("doc_id"))
  }

  // ---- q_zstd_dict: shared-dictionary compression for small records --------------

  private val PerDict = 32
  private val DictSize = 1024

  /** The small-record path a real crawl/interchange pipeline actually
    * takes: individual documents are far below zstd's break-even frame
    * size, so shards train a SHARED DICTIONARY (zdict) and compress each
    * record as its own dict-referencing frame — random access per record
    * (no shard-prefix decompression) at close-to-batch ratios. Both
    * halves real: the dictionary is trained by the real zdict trainer
    * (samples in doc_id order, repeated to satisfy zdict's minimum
    * corpus), each doc compresses through a dict-loaded context, OUR
    * walk (allowDict) verifies every frame names exactly the trained
    * dictionary's embedded id, and the real dict-loaded decompressor
    * round-trips each record sized by the walked content size. The
    * oracle recomputes every gated column closed-form; dictionary bytes
    * and ratios are trainer-dependent and deliberately not gated
    * (ZstdSpec bounds the behavior instead).
    */
  val q_zstd_dict: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerDict AS shard, text,
       |    octet_length(encode(text)) AS plen
       |  FROM documents)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n_docs,
       |  CAST(plen AS BIGINT) AS content_size,
       |  TRUE AS dict_id_match,
       |  md5(text) AS doc_md5
       |FROM d
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerDict")))
      .groupBy(expr(s"doc_id div $PerDict").as("shard"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("text").as("_2")))).as("docs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (shard, docs) =>
          val payloads = docs.map(_._2.getBytes(UTF_8))
          // zdict needs a corpus many times the dictionary size; small
          // shards repeat their samples (deterministically, doc_id order)
          // until the trainer has enough — quality is irrelevant to the
          // round-trip contract
          val repeats = math.max(1,
            math.ceil(DictSize * 32.0 / math.max(1, payloads.map(_.length).sum)).toInt)
          val trainer = new com.github.luben.zstd.ZstdDictTrainer(
            payloads.map(_.length).sum * repeats + 1024, DictSize)
          (0 until repeats).foreach(_ => payloads.foreach(p => trainer.addSample(p)))
          val dict = trainer.trainSamples()
          val dictId = com.github.luben.zstd.Zstd.getDictIdFromDict(dict)
          val cctx = new com.github.luben.zstd.ZstdCompressCtx()
          cctx.setLevel(Level)
          cctx.loadDict(dict)
          val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
          dctx.loadDict(dict)
          try docs.zip(payloads).map { case ((id, _), p) =>
            val frame = cctx.compress(p)
            val walked = parseZstd(id, frame, allowDict = true)
            if (walked.size != 1) throw new IllegalStateException(
              s"doc $id: one dict frame expected, got $walked")
            val f = walked.head
            if (f.contentSize != p.length) throw new IllegalStateException(
              s"doc $id: walked FCS ${f.contentSize} != ${p.length}")
            val idMatch = f.dictId == dictId && dictId != 0L
            val back = dctx.decompress(frame, f.contentSize.toInt)
            md.reset()
            val hex = md.digest(back).map("%02x".format(_)).mkString
            (id, shard, docs.size.toLong, p.length.toLong, idMatch, hex)
          } finally { cctx.close(); dctx.close() }
        }
      }
      .toDF("doc_id", "shard", "n_docs", "content_size", "dict_id_match",
        "doc_md5")
      .orderBy(col("doc_id"))
  }

  // ---- q_warc_seek: random access through the standard seek table ---------------

  /** The production read path into a `.warc.zst` crawl: every record is
    * fetched INDIVIDUALLY through the standard seekable-format table —
    * footer parsed from the END of the shard, one frame sliced and
    * decompressed per fetch — never by decompressing the shard prefix.
    * The proof is in-query and adversarial: before each fetch, every
    * byte of every OTHER data frame is overwritten with garbage; a
    * reader that touched anything outside the target frame's
    * [offset, offset+csize) slice would throw or hash-mismatch. The
    * oracle gates the same CDX arithmetic as `q_warc_zst` (the seek
    * table's decompressed sizes ARE the record offsets) plus
    * frames_decoded = 1 per fetch.
    */
  val q_warc_seek: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS wf, text,
       |    octet_length(encode(text)) AS plen,
       |    'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       |    'urn:doc:' || CAST(doc_id AS VARCHAR) AS rid
       |  FROM documents),
       |z AS (SELECT *, ${Warc.RecFixed} + length(rid) + length(uri)
       |    + length(CAST(plen AS VARCHAR)) + plen AS rec_bytes
       |  FROM d)
       |SELECT doc_id, CAST(wf AS BIGINT) AS warc_file, uri,
       |  CAST(count(*) OVER (PARTITION BY wf) AS BIGINT) AS n_frames,
       |  CAST(plen AS BIGINT) AS content_length,
       |  md5(text) AS payload_md5,
       |  CAST(coalesce(sum(rec_bytes) OVER (PARTITION BY wf ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset,
       |  CAST(1 AS BIGINT) AS frames_decoded
       |FROM z
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("wf"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("text").as("_2")))).as("docs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (wf, docs) =>
          val recs = docs.map { case (id, text) =>
            (s"https://example.org/doc/$id", s"urn:doc:$id", text.getBytes(UTF_8))
          }
          val shard = encodeWarcZstSeekable(recs)
          // footer-first: the table is all a reader needs — no frame walk
          val table = parseSeekTable(wf, shard)
          if (table.size != docs.size) throw new IllegalStateException(
            s"warc.zst $wf: ${docs.size} records in, seek table of ${table.size}")
          val offsets = table.scanLeft(0L)(_ + _.compressedSize)
          val recOffsets = table.scanLeft(0L)(_ + _.decompressedSize)
          (0 until table.size).map { n =>
            // adversarial copy: garbage every data frame EXCEPT the target
            // (the seek table region at the tail stays intact)
            val hostile = shard.clone()
            java.util.Arrays.fill(hostile, 0, offsets(n).toInt, 0xaa.toByte)
            java.util.Arrays.fill(hostile, (offsets(n) + table(n).compressedSize).toInt,
              offsets.last.toInt, 0xaa.toByte)
            val one = Warc.parseWarcRecords(wf, seekFetch(wf, hostile, table, n))
            if (one.size != 1) throw new IllegalStateException(
              s"warc.zst $wf frame $n: expected one record, got ${one.size}")
            val r = one.head
            md.reset()
            val hex = md.digest(r.payload).map("%02x".format(_)).mkString
            val docId = r.uri.substring(r.uri.lastIndexOf('/') + 1).toLong
            (docId, wf, r.uri, table.size.toLong, r.contentLength.toLong, hex,
              recOffsets(n), 1L)
          }
        }
      }
      .toDF("doc_id", "warc_file", "uri", "n_frames", "content_length",
        "payload_md5", "rec_offset", "frames_decoded")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_zstd_shard" -> q_zstd_shard,
    "q_zstd_dict" -> q_zstd_dict,
    "q_warc_zst" -> q_warc_zst,
    "q_warc_seek" -> q_warc_seek)
}
