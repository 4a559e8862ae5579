package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Parquet DATA-PAGE reader — the other half of the H81 footer walk
  * (ParquetLite): decode the VALUES of real parquet files, including
  * files written by Spark/parquet-mr itself, through hand-rolled
  * decoders of every public format layer on the read path:
  *
  *  - **snappy raw-block format** (the codec parquet defaults to):
  *    varint preamble + literal / copy-1 / copy-2 / copy-4 tags with
  *    overlapping-copy semantics — decoded byte-by-byte, no library;
  *  - **RLE / bit-packed hybrid** (definition levels and dictionary
  *    indices): varint header, LSB-discriminated RLE runs (fixed-width
  *    little-endian repeated value) vs bit-packed groups of 8
  *    (LSB-first sub-byte packing), with the trailing-group padding
  *    rule;
  *  - **v1 data pages**: thrift-compact PageHeader (via ParquetLite's
  *    generic TReader), whole-page decompression, 4-byte-LE-prefixed
  *    definition levels for optional columns (absent when max_def = 0),
  *    PLAIN and PLAIN_/RLE_DICTIONARY value encodings with per-page
  *    dictionary-fallback switching (parquet-mr falls back mid-chunk
  *    when a dictionary stops paying — unique-valued columns exercise
  *    the PLAIN path, low-cardinality columns the dictionary path, in
  *    the same file);
  *  - **dictionary pages**: PLAIN-encoded entry lists for INT32 /
  *    INT64 / DOUBLE / BYTE_ARRAY.
  *
  *  - **v2 data pages** (what modern writers emit): levels ride
  *    UNCOMPRESSED ahead of a values-only-compressed section, header-
  *    declared level byte lengths, num_nulls cross-checked against the
  *    decoded levels — plus the three DELTA encodings v2 writers fall
  *    back to: DELTA_BINARY_PACKED (zigzag block header, per-miniblock
  *    bit widths, LSB-first packed delta offsets over a min-delta),
  *    DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY (shared-prefix
  *    front coding).
  *
  * GZIP pages inflate through the JDK (`GZIPInputStream` — zlib is a
  * JDK primitive, not a codec library); unsupported codecs, bad snappy
  * tags (offset 0, copy before window start, literal crossing the
  * input), hybrid runs past the declared value count, DELTA prefixes
  * longer than their predecessor, and a page walk that does not land
  * exactly on the next page boundary all fail LOUDLY with the byte
  * offset (the MediaDecoder contract).
  *
  * Cross-validated in ParquetReadSpec against the real stack in both
  * directions: snappy vs snappy-java (xerial, the copy Spark ships),
  * hybrid vs parquet-column's RunLengthBitPackingHybridEncoder,
  * whole files written by `spark.write.parquet` (snappy + dictionary +
  * optional fields) decoded row-identical to `spark.read`, and
  * ParquetLite's own PLAIN/UNCOMPRESSED files round-tripped.
  *
  * Scale shape: decoding is one mapPartitions pass over bounded
  * per-group payloads, zero post-decode shuffles; a chunk is read
  * strictly sequentially (dict page, then data pages) — the executor-
  * side I/O profile of a real columnar scan.
  */
object ParquetRead {

  // ---- snappy raw-block format -----------------------------------------------------

  /** Decode one snappy raw block (the format of each parquet page body
    * under codec=SNAPPY). Public format: varint uncompressed length,
    * then a tag stream — 2-bit discriminator: 0 literal (6-bit length,
    * 60-63 escape to 1-4 LE extra bytes), 1 copy with 3-bit len / 11-bit
    * offset, 2 / 3 copies with 2- / 4-byte LE offsets. Copies may
    * overlap their own output (the RLE idiom), so they move one byte at
    * a time.
    */
  def snappyUncompress(ctx: String, in: Array[Byte]): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: snappy decode at byte $off: $why")
    var ip = 0
    def u8(): Int = {
      if (ip >= in.length) fail(ip, "input truncated")
      val v = in(ip) & 0xff; ip += 1; v
    }
    // preamble: uncompressed length, varint
    var outLen = 0L
    var shift = 0
    var done = false
    while (!done) {
      if (shift >= 35) fail(0, "preamble varint longer than 5 bytes")
      val b = u8()
      outLen |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) done = true
      shift += 7
    }
    if (outLen > Int.MaxValue - 8) fail(0, s"claimed uncompressed length $outLen")
    val out = new Array[Byte](outLen.toInt)
    var op = 0
    def leExtra(n: Int): Int = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (u8().toLong & 0xff) << (8 * i); i += 1 }
      if (v > Int.MaxValue - 16) fail(ip, s"length/offset field $v out of range")
      v.toInt
    }
    while (ip < in.length) {
      val at = ip
      val tag = u8()
      (tag & 3) match {
        case 0 => // literal
          val six = tag >>> 2
          val len = if (six < 60) six + 1 else leExtra(six - 59) + 1
          if (ip + len > in.length) fail(at, s"literal of $len crosses the input end")
          if (op + len > out.length) fail(at, s"literal of $len crosses the declared output")
          System.arraycopy(in, ip, out, op, len)
          ip += len; op += len
        case k => // copy
          val (len, off) = k match {
            case 1 => (((tag >>> 2) & 7) + 4, ((tag >>> 5) << 8) | u8())
            case 2 => ((tag >>> 2) + 1, leExtra(2))
            case _ => ((tag >>> 2) + 1, leExtra(4))
          }
          if (off <= 0) fail(at, "copy offset 0")
          if (off > op) fail(at, s"copy offset $off reaches before the output start (at $op)")
          if (op + len > out.length) fail(at, s"copy of $len crosses the declared output")
          var i = 0
          while (i < len) { out(op) = out(op - off); op += 1; i += 1 }
      }
    }
    if (op != out.length) fail(ip, s"tag stream produced $op of the declared ${out.length} bytes")
    out
  }

  // ---- RLE / bit-packed hybrid ------------------------------------------------------

  /** Decode exactly `n` values of `bitWidth` bits from the hybrid
    * stream in `b[from, end)`. Returns (values, position after the last
    * consumed byte). The final bit-packed group may pad up to 7 values
    * past `n` (the spec's group-of-8 rule); an RLE run past `n` is
    * corruption and fails.
    */
  def readHybrid(ctx: String, b: Array[Byte], from: Int, end: Int,
      bitWidth: Int, n: Int): (Array[Int], Int) = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: rle/bit-packed decode at byte $off: $why")
    if (bitWidth < 0 || bitWidth > 32) fail(from, s"bit width $bitWidth out of [0,32]")
    val out = new Array[Int](n)
    var k = 0
    var pos = from
    def varint(): Long = {
      val at = pos
      var shift = 0
      var acc = 0L
      while (true) {
        if (shift >= 35) fail(at, "hybrid header varint longer than 5 bytes")
        if (pos >= end) fail(pos, "hybrid header truncated")
        val byte = b(pos) & 0xff; pos += 1
        acc |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return acc
        shift += 7
      }
      0L // unreachable
    }
    val byteWidth = (bitWidth + 7) / 8
    while (k < n) {
      val at = pos
      val header = varint()
      if ((header & 1) == 0) { // RLE run
        val run = header >>> 1
        if (run == 0) fail(at, "zero-length RLE run")
        if (k + run > n) fail(at, s"RLE run of $run overruns the $n declared values at $k")
        if (pos + byteWidth > end) fail(pos, "RLE repeated value truncated")
        var v = 0
        var i = 0
        while (i < byteWidth) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
        pos += byteWidth
        var j = 0L
        while (j < run) { out(k) = v; k += 1; j += 1 }
      } else { // bit-packed groups of 8
        val groups = header >>> 1
        if (groups == 0) fail(at, "zero-length bit-packed group")
        val count = groups * 8
        val nbytes = (count * bitWidth + 7) / 8
        if (nbytes > end - pos) fail(pos, s"bit-packed group of $count values truncated")
        val take = math.min(count, (n - k).toLong).toInt
        var i = 0
        while (i < take) {
          val bitPos = i.toLong * bitWidth
          var v = 0L
          var got = 0
          while (got < bitWidth) {
            val byteAt = pos + (bitPos + got) / 8
            val bitAt = ((bitPos + got) % 8).toInt
            val avail = 8 - bitAt
            val use = math.min(avail, bitWidth - got)
            v |= (((b(byteAt.toInt) & 0xff) >>> bitAt) & ((1 << use) - 1)).toLong << got
            got += use
          }
          out(k) = v.toInt; k += 1; i += 1
        }
        if (take < count && k < n) fail(at, "internal: partial group before the value count")
        pos += nbytes.toInt
      }
    }
    (out, pos)
  }

  // ---- DELTA encodings (v2 data pages) ------------------------------------------------

  /** DELTA_BINARY_PACKED: block header (block size / miniblocks per
    * block / total count / zigzag first value), then per block a zigzag
    * min-delta, one bit-width byte per miniblock, and LSB-first
    * bit-packed delta offsets. The last block's unused miniblocks are
    * absent but their width bytes are present. Returns (values, end).
    */
  def decodeDeltaBinaryPacked(ctx: String, b: Array[Byte], from: Int, end: Int,
      expect: Int): (Array[Long], Int) = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: DELTA_BINARY_PACKED decode at byte $off: $why")
    var pos = from
    def varint(): Long = {
      val at = pos
      var shift = 0
      var acc = 0L
      while (true) {
        if (shift >= 70) fail(at, "varint longer than 10 bytes")
        if (pos >= end) fail(pos, "varint truncated")
        val byte = b(pos) & 0xff; pos += 1
        acc |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return acc
        shift += 7
      }
      0L // unreachable
    }
    def zig(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    val blockSize = varint().toInt
    val numMini = varint().toInt
    if (numMini <= 0 || blockSize <= 0 || blockSize % numMini != 0)
      fail(from, s"block geometry $blockSize/$numMini")
    val miniSize = blockSize / numMini
    if (miniSize % 8 != 0) fail(from, s"miniblock of $miniSize values not a multiple of 8")
    val total = varint().toInt
    if (total != expect) fail(from, s"header claims $total values, page claims $expect")
    val out = new Array[Long](total)
    if (total == 0) return (out, pos)
    out(0) = zig()
    var k = 1
    while (k < total) {
      val minDelta = zig()
      val widths = new Array[Int](numMini)
      var i = 0
      while (i < numMini) {
        if (pos >= end) fail(pos, "miniblock width list truncated")
        widths(i) = b(pos) & 0xff; pos += 1; i += 1
      }
      i = 0
      while (i < numMini && k < total) {
        val w = widths(i)
        if (w > 64) fail(pos, s"miniblock bit width $w")
        val nbytes = miniSize.toLong * w / 8
        if (pos + nbytes > end) fail(pos, s"miniblock of $miniSize x $w bits truncated")
        var j = 0
        while (j < miniSize && k < total) {
          var v = 0L
          var got = 0
          val bitPos = j.toLong * w
          while (got < w) {
            val byteAt = pos + ((bitPos + got) / 8).toInt
            val bitAt = ((bitPos + got) % 8).toInt
            val avail = 8 - bitAt
            val use = math.min(avail, w - got)
            v |= (((b(byteAt) & 0xff) >>> bitAt) & ((1 << use) - 1)).toLong << got
            got += use
          }
          out(k) = out(k - 1) + minDelta + v
          k += 1; j += 1
        }
        pos += nbytes.toInt
        i += 1
      }
    }
    (out, pos)
  }

  /** DELTA_LENGTH_BYTE_ARRAY: DELTA_BINARY_PACKED lengths, then the
    * concatenated value bytes.
    */
  def decodeDeltaLengthByteArray(ctx: String, b: Array[Byte], from: Int, end: Int,
      n: Int): (Vector[Array[Byte]], Int) = {
    val (lens, at0) = decodeDeltaBinaryPacked(ctx, b, from, end, n)
    var at = at0
    val out = Vector.newBuilder[Array[Byte]]
    lens.foreach { len =>
      if (len < 0 || at + len > end) throw new IllegalArgumentException(
        s"$ctx: DELTA_LENGTH_BYTE_ARRAY at byte $at: value of $len crosses the page end")
      out += java.util.Arrays.copyOfRange(b, at, at + len.toInt)
      at += len.toInt
    }
    (out.result(), at)
  }

  /** DELTA_BYTE_ARRAY: shared-prefix lengths (DELTA_BINARY_PACKED) +
    * suffixes (DELTA_LENGTH_BYTE_ARRAY); value = previous value's
    * prefix + suffix.
    */
  def decodeDeltaByteArray(ctx: String, b: Array[Byte], from: Int, end: Int,
      n: Int): (Vector[Array[Byte]], Int) = {
    val (prefixes, at0) = decodeDeltaBinaryPacked(ctx, b, from, end, n)
    val (suffixes, at1) = decodeDeltaLengthByteArray(ctx, b, at0, end, n)
    val out = Vector.newBuilder[Array[Byte]]
    var prev = Array.emptyByteArray
    var i = 0
    while (i < n) {
      val p = prefixes(i)
      if (p < 0 || p > prev.length) throw new IllegalArgumentException(
        s"$ctx: DELTA_BYTE_ARRAY value $i: prefix of $p from a ${prev.length}-byte predecessor")
      val v = new Array[Byte](p.toInt + suffixes(i).length)
      System.arraycopy(prev, 0, v, 0, p.toInt)
      System.arraycopy(suffixes(i), 0, v, p.toInt, suffixes(i).length)
      out += v
      prev = v
      i += 1
    }
    (out.result(), at1)
  }

  // ---- PLAIN decoders ---------------------------------------------------------------

  /** Decode `n` PLAIN values of physical type `typ` from `b[from, end)`.
    * BYTE_ARRAY values come back as Array[Byte]; INT32/INT64 as Long;
    * DOUBLE as Double.
    */
  def decodePlain(ctx: String, b: Array[Byte], from: Int, end: Int,
      typ: String, n: Int): (Vector[Any], Int) = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: PLAIN $typ decode at byte $off: $why")
    var pos = from
    def leN(w: Int): Long = {
      if (pos + w > end) fail(pos, "value truncated")
      var v = 0L
      var i = 0
      while (i < w) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += w
      v
    }
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < n) {
      typ match {
        case "INT64" => out += leN(8)
        case "INT32" => out += ((leN(4) << 32) >> 32) // sign-extend
        case "DOUBLE" => out += java.lang.Double.longBitsToDouble(leN(8))
        case "BYTE_ARRAY" =>
          val len = leN(4)
          if (len < 0 || pos + len > end) fail(pos - 4, s"byte array length $len crosses the page end")
          out += java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
          pos += len.toInt
        case other => fail(pos, s"unsupported physical type $other on the value path")
      }
      i += 1
    }
    (out.result(), pos)
  }

  // ---- the chunk reader ---------------------------------------------------------------

  /** One decoded column chunk: values in row order with `null` for
    * absent optional values, plus the dictionary entry count (None when
    * no dictionary page was present).
    */
  final case class DecodedChunk(values: Vector[Any], dictEntries: Option[Int])

  private def inflateGzip(ctx: String, in: Array[Byte], expect: Long): Array[Byte] = {
    val is = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(in))
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, expect.toInt))
      val buf = new Array[Byte](8192)
      var r = is.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = is.read(buf) }
      out.toByteArray
    } finally is.close()
  }

  /** Decode every value of one column chunk from the complete file
    * bytes: optional dictionary page, then v1 data pages until the
    * chunk's declared value count (nulls included) is reached.
    * `maxDef` is the column's maximum definition level (0 = required).
    */
  def readChunk(ctx: String, file: Array[Byte], chunk: ParquetLite.ChunkMeta,
      maxDef: Int): DecodedChunk = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: chunk ${chunk.path} at byte $off: $why")
    var pos = chunk.dictPageOffset.getOrElse(chunk.dataPageOffset)
    if (pos < 4 || pos >= file.length) fail(pos, "first page offset outside the file")
    var dict: Vector[Any] = null
    var dictEntries: Option[Int] = None
    val values = Vector.newBuilder[Any]
    var counted = 0L
    val defWidth = 32 - Integer.numberOfLeadingZeros(maxDef max 1) // bits for [0, maxDef]
    while (counted < chunk.numValues) {
      val r = new ParquetLite.TReader(ctx, file, pos.toInt, file.length)
      val header = r.readStruct()
      def req(o: Option[Long], what: String): Long =
        o.getOrElse(fail(pos, s"PageHeader missing $what"))
      val ptype = req(header.int(1), "type").toInt
      val uncompSz = req(header.int(2), "uncompressed_page_size")
      val compSz = req(header.int(3), "compressed_page_size")
      val bodyStart = r.pos
      if (compSz < 0 || bodyStart + compSz > file.length)
        fail(bodyStart, s"page body of $compSz crosses the file end")
      val raw = java.util.Arrays.copyOfRange(file, bodyStart, bodyStart + compSz.toInt)
      def inflate(in: Array[Byte], expect: Long): Array[Byte] = {
        val out = chunk.codec match {
          case "UNCOMPRESSED" => in
          case "SNAPPY" => snappyUncompress(ctx, in)
          case "GZIP" => inflateGzip(ctx, in, expect)
          case "LZ4_RAW" => Lz4.decompress(ctx, in, expect.toInt)
          case "LZ4" => Lz4.hadoopUncompress(ctx, in, expect.toInt) // legacy Hadoop framing
          case "ZSTD" =>
            // frame content via the zstd-jni Spark ships (as GZIP rides
            // the JDK); the FRAME walk itself is hand-rolled in H77
            com.github.luben.zstd.Zstd.decompress(in, expect.toInt)
          case other => fail(bodyStart, s"unsupported codec $other on the page path")
        }
        if (out.length != expect)
          fail(bodyStart, s"page inflated to ${out.length}, header declared $expect")
        out
      }
      lazy val body = inflate(raw, uncompSz)
      ptype match {
        case 2 => // DICTIONARY_PAGE
          if (dict != null) fail(pos, "second dictionary page in one chunk")
          val dph = header.struct(7).getOrElse(fail(pos, "dictionary page without dictionary_page_header"))
          val n = req(dph.int(1), "dictionary num_values").toInt
          val (vs, at) = decodePlain(ctx, body, 0, body.length, chunk.typ, n)
          if (at != body.length) fail(bodyStart, s"dictionary walk left ${body.length - at} bytes")
          dict = vs
          dictEntries = Some(n)
        case 0 => // DATA_PAGE (v1)
          val dph = header.struct(5).getOrElse(fail(pos, "data page without data_page_header"))
          val n = req(dph.int(1), "page num_values").toInt
          val enc = req(dph.int(2), "page encoding").toInt
          var at = 0
          val defs: Array[Int] =
            if (maxDef == 0) Array.fill(n)(0)
            else {
              if (at + 4 > body.length) fail(bodyStart, "definition-level length truncated")
              var len = 0L
              var i = 0
              while (i < 4) { len |= (body(at + i) & 0xffL) << (8 * i); i += 1 }
              at += 4
              if (len < 0 || at + len > body.length)
                fail(bodyStart, s"definition levels of $len cross the page end")
              val (ds, dEnd) = readHybrid(ctx, body, at, at + len.toInt, defWidth, n)
              if (dEnd > at + len) fail(bodyStart, "definition levels overran their length word")
              at += len.toInt
              ds
            }
          val present = defs.count(_ == maxDef)
          val decoded: IndexedSeq[Any] = ParquetLite.encodingName(ctx, enc) match {
            case "PLAIN" =>
              val (vs, vEnd) = decodePlain(ctx, body, at, body.length, chunk.typ, present)
              if (vEnd != body.length) fail(bodyStart, s"PLAIN walk left ${body.length - vEnd} bytes")
              vs
            case "PLAIN_DICTIONARY" | "RLE_DICTIONARY" =>
              if (dict == null) fail(pos, "dictionary-encoded page before any dictionary page")
              if (at >= body.length) fail(bodyStart, "dictionary index section truncated")
              val w = body(at) & 0xff; at += 1
              if (w > 32) fail(bodyStart, s"dictionary index bit width $w")
              val (idx, iEnd) = readHybrid(ctx, body, at, body.length, w, present)
              if (iEnd != body.length)
                fail(bodyStart, s"index walk left ${body.length - iEnd} bytes")
              idx.map { i =>
                if (i < 0 || i >= dict.size) fail(bodyStart, s"dictionary index $i of ${dict.size}")
                dict(i)
              }.toIndexedSeq
            // the DELTA encodings are legal in v1 pages too (parquet-format
            // does not restrict them to v2; parquet-mr has been observed
            // emitting them under v1 headers)
            case "DELTA_BINARY_PACKED" =>
              if (chunk.typ != "INT64" && chunk.typ != "INT32")
                fail(pos, s"DELTA_BINARY_PACKED on ${chunk.typ}")
              val (vs, _) = decodeDeltaBinaryPacked(ctx, body, at, body.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case "DELTA_LENGTH_BYTE_ARRAY" =>
              if (chunk.typ != "BYTE_ARRAY") fail(pos, s"DELTA_LENGTH_BYTE_ARRAY on ${chunk.typ}")
              val (vs, _) = decodeDeltaLengthByteArray(ctx, body, at, body.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case "DELTA_BYTE_ARRAY" =>
              if (chunk.typ != "BYTE_ARRAY") fail(pos, s"DELTA_BYTE_ARRAY on ${chunk.typ}")
              val (vs, _) = decodeDeltaByteArray(ctx, body, at, body.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case other => fail(pos, s"unsupported data page encoding $other")
          }
          var vi = 0
          defs.foreach { d =>
            if (d == maxDef) { values += decoded(vi); vi += 1 }
            else values += null
          }
          counted += n
        case 3 => // DATA_PAGE_V2: levels ride uncompressed ahead of the values
          val dph = header.struct(8).getOrElse(fail(pos, "v2 page without data_page_header_v2"))
          val n = req(dph.int(1), "page num_values").toInt
          val numNulls = req(dph.int(2), "page num_nulls").toInt
          val enc = req(dph.int(4), "page encoding").toInt
          val defLen = req(dph.int(5), "definition_levels_byte_length").toInt
          val repLen = req(dph.int(6), "repetition_levels_byte_length").toInt
          val isCompressed = dph.fields.get(7) match {
            case Some(ParquetLite.TBool(v)) => v
            case None => true // the IDL default
            case Some(other) => fail(pos,
              s"is_compressed is not a bool (${other.getClass.getSimpleName})")
          }
          if (repLen + defLen > raw.length)
            fail(bodyStart, s"v2 level sections of ${repLen + defLen} cross the page body")
          val defs: Array[Int] =
            if (maxDef == 0) {
              if (defLen != 0) fail(bodyStart,
                s"required column carries $defLen definition-level bytes")
              Array.fill(n)(0)
            } else {
              val (ds, dEnd) = readHybrid(ctx, raw, repLen, repLen + defLen, defWidth, n)
              if (dEnd > repLen + defLen) fail(bodyStart, "v2 definition levels overran their section")
              ds
            }
          val present = defs.count(_ == maxDef)
          if (present != n - numNulls)
            fail(bodyStart, s"v2 header claims ${n - numNulls} present values, levels carry $present")
          val vraw = java.util.Arrays.copyOfRange(raw, repLen + defLen, raw.length)
          val vbytes = if (isCompressed) inflate(vraw, uncompSz - repLen - defLen) else vraw
          val decoded: IndexedSeq[Any] = ParquetLite.encodingName(ctx, enc) match {
            case "PLAIN" =>
              val (vs, vEnd) = decodePlain(ctx, vbytes, 0, vbytes.length, chunk.typ, present)
              if (vEnd != vbytes.length) fail(bodyStart, s"PLAIN walk left ${vbytes.length - vEnd} bytes")
              vs
            case "PLAIN_DICTIONARY" | "RLE_DICTIONARY" =>
              if (dict == null) fail(pos, "dictionary-encoded page before any dictionary page")
              if (vbytes.isEmpty) fail(bodyStart, "dictionary index section truncated")
              val w = vbytes(0) & 0xff
              if (w > 32) fail(bodyStart, s"dictionary index bit width $w")
              val (idx, iEnd) = readHybrid(ctx, vbytes, 1, vbytes.length, w, present)
              if (iEnd != vbytes.length)
                fail(bodyStart, s"index walk left ${vbytes.length - iEnd} bytes")
              idx.map { i =>
                if (i < 0 || i >= dict.size) fail(bodyStart, s"dictionary index $i of ${dict.size}")
                dict(i)
              }.toIndexedSeq
            case "DELTA_BINARY_PACKED" =>
              if (chunk.typ != "INT64" && chunk.typ != "INT32")
                fail(pos, s"DELTA_BINARY_PACKED on ${chunk.typ}")
              val (vs, _) = decodeDeltaBinaryPacked(ctx, vbytes, 0, vbytes.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case "DELTA_LENGTH_BYTE_ARRAY" =>
              if (chunk.typ != "BYTE_ARRAY") fail(pos, s"DELTA_LENGTH_BYTE_ARRAY on ${chunk.typ}")
              val (vs, _) = decodeDeltaLengthByteArray(ctx, vbytes, 0, vbytes.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case "DELTA_BYTE_ARRAY" =>
              if (chunk.typ != "BYTE_ARRAY") fail(pos, s"DELTA_BYTE_ARRAY on ${chunk.typ}")
              val (vs, _) = decodeDeltaByteArray(ctx, vbytes, 0, vbytes.length, present)
              vs.map(v => v: Any).toIndexedSeq
            case other => fail(pos, s"unsupported v2 data page encoding $other")
          }
          var vi = 0
          defs.foreach { d =>
            if (d == maxDef) { values += decoded(vi); vi += 1 }
            else values += null
          }
          counted += n
        case t => fail(pos, s"unexpected page type $t in a column chunk")
      }
      pos = bodyStart + compSz
      if (counted > chunk.numValues)
        fail(pos, s"pages carried $counted values, chunk declared ${chunk.numValues}")
    }
    DecodedChunk(values.result(), dictEntries)
  }

  /** Decode all leaves of a single-row-group file written with flat
    * (non-repeated) schema; returns values per leaf path in row order.
    */
  def readAll(ctx: String, file: Array[Byte]): (ParquetLite.FooterMeta, Map[String, DecodedChunk]) = {
    val m = ParquetLite.parseFooter(ctx, file)
    if (m.groups.size != 1) throw new IllegalArgumentException(
      s"$ctx: readAll expects one row group, footer has ${m.groups.size}")
    val byPath = m.leaves.map(l => l.path -> l).toMap
    val cols = m.groups.head.chunks.map { c =>
      val leaf = byPath.getOrElse(c.path, throw new IllegalArgumentException(
        s"$ctx: chunk ${c.path} has no schema leaf"))
      if (leaf.repetition == 2) throw new IllegalArgumentException(
        s"$ctx: repeated leaf ${c.path} needs repetition levels (unsupported)")
      c.path -> readChunk(ctx, file, c, maxDef = if (leaf.repetition == 1) 1 else 0)
    }.toMap
    (m, cols)
  }

  // ---- q_parquet_read -----------------------------------------------------------------

  private val PerFile = 100

  private def md5hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** Real parquet-mr files (SNAPPY, dictionary on, v1 pages, an
    * optional INT64 column) decoded VALUE-FOR-VALUE by the hand-rolled
    * page reader: per 100-doc file, the decoded row count, INT64 sum,
    * order-sensitive md5 of the decoded text and lang streams, the lang
    * dictionary entry count, and the optional column's null census and
    * non-null sum — every column recomputed closed-form by DuckDB from
    * the documents table. doc_id (unique) exercises the dictionary→
    * PLAIN fallback path; lang (low-cardinality) stays dictionary-
    * encoded; opt_len exercises definition levels. The writer here is
    * the REAL parquet-mr (the library Spark writes through) — the
    * component under test is the hand-rolled read stack.
    */
  val q_parquet_read: QueryDef = QueryDef(
    s"""SELECT CAST(doc_id // $PerFile AS BIGINT) AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  'SNAPPY' AS codec,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |  md5(string_agg(text, '' ORDER BY doc_id)) AS text_md5,
       |  md5(string_agg(lang, '' ORDER BY doc_id)) AS lang_md5,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_lang_dict,
       |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS opt_nulls,
       |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN (doc_id * 37 + 11) % 1000 END) AS BIGINT) AS opt_sum
       |FROM documents
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      // streaming group decode — one group buffered at a time, not the
      // whole partition's groups in an agg buffer (DecodeStage.groupConsecutive)
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        DecodeStage.groupConsecutive(it,
          (r: (Long, String, String)) => java.lang.Math.floorDiv(r._1, PerFile))
        .map { case (fileId, docs) =>
          val ctx = s"file $fileId"
          val bytes = writeViaParquetMr(docs)
          val (m, cols) = readAll(ctx, bytes)
          if (m.numRows != docs.size) throw new IllegalStateException(
            s"$ctx: wrote ${docs.size} rows, footer says ${m.numRows}")
          val g = m.groups.head
          val codec = g.chunks.map(_.codec).distinct match {
            case Vector(c) => c
            case other => throw new IllegalStateException(s"$ctx: mixed codecs $other")
          }
          def chunk(p: String): DecodedChunk = cols.getOrElse(p,
            throw new IllegalStateException(s"$ctx: no decoded chunk for $p"))
          val ids = chunk("doc_id").values.map(_.asInstanceOf[Long])
          val texts = chunk("text").values.map(_.asInstanceOf[Array[Byte]])
          val langs = chunk("lang").values.map(_.asInstanceOf[Array[Byte]])
          val opts = chunk("opt_len").values
          if (ids.size != docs.size || texts.size != docs.size ||
              langs.size != docs.size || opts.size != docs.size)
            throw new IllegalStateException(s"$ctx: decoded column lengths " +
              s"${ids.size}/${texts.size}/${langs.size}/${opts.size} != ${docs.size}")
          val nLangDict = chunk("lang").dictEntries.getOrElse(
            throw new IllegalStateException(s"$ctx: lang chunk lost its dictionary page"))
          val textCat = new java.io.ByteArrayOutputStream()
          texts.foreach(t => textCat.write(t, 0, t.length))
          val langCat = new java.io.ByteArrayOutputStream()
          langs.foreach(l => langCat.write(l, 0, l.length))
          (fileId, ids.size.toLong, codec, ids.sum,
            md5hex(textCat.toByteArray), md5hex(langCat.toByteArray),
            nLangDict.toLong,
            opts.count(_ == null).toLong,
            opts.collect { case v: Long => v }.sum)
        }
      }
      .toDF("file_id", "n_rows", "codec", "sum_doc_id", "text_md5", "lang_md5",
        "n_lang_dict", "opt_nulls", "opt_sum")
      .orderBy(col("file_id"))
  }

  /** Write one (doc_id, text, lang, opt_len) file through the REAL
    * parquet-mr (SNAPPY, dictionary enabled, v1 pages) — the
    * independent-writer half of the cross-validation; `opt_len` is
    * `(doc_id*37+11)%1000`, absent when `doc_id%3==0` so the
    * definition-level path carries real nulls.
    */
  def writeViaParquetMr(docs: Seq[(Long, String, String)], v2: Boolean = false,
      dictionary: Boolean = true, codecName: String = "SNAPPY",
      pageRowLimit: Option[Int] = None,
      bloomNdv: Seq[(String, Long)] = Nil): Array[Byte] = {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    val schema = MessageTypeParser.parseMessageType(
      """message doc {
        |  required int64 doc_id;
        |  required binary text (STRING);
        |  required binary lang (STRING);
        |  optional int64 opt_len;
        |}""".stripMargin)
    val tmp = java.nio.file.Files.createTempFile("graft_pqread", ".parquet")
    try {
      var builder = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(tmp.toUri.toString))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .withType(schema)
        .withCompressionCodec(CompressionCodecName.valueOf(codecName))
        .withDictionaryEncoding(dictionary)
        .withWriterVersion(
          if (v2) org.apache.parquet.column.ParquetProperties.WriterVersion.PARQUET_2_0
          else org.apache.parquet.column.ParquetProperties.WriterVersion.PARQUET_1_0)
        .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      pageRowLimit.foreach { n =>
        // enforce the limit exactly: parquet-mr only checks the page
        // cut condition every 100 rows unless told otherwise
        builder = builder.withPageRowCountLimit(n)
          .withMinRowCountForPageSizeCheck(1)
      }
      bloomNdv.foreach { case (colName, ndv) =>
        builder = builder.withBloomFilterEnabled(colName, true)
          .withBloomFilterNDV(colName, ndv)
      }
      val writer = builder.build()
      try docs.foreach { case (id, text, lang) =>
        val g = new SimpleGroup(schema)
        g.add("doc_id", id)
        g.add("text", text)
        g.add("lang", lang)
        if (id % 3 != 0) g.add("opt_len", (id * 37 + 11) % 1000)
        writer.write(g)
      } finally writer.close()
      java.nio.file.Files.readAllBytes(tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** The v2 twin of [[q_parquet_read]]: the same files written as
    * DATA_PAGE_V2 with dictionary encoding OFF, so every column takes
    * the encoding a v2 writer falls back to — doc_id / opt_len
    * DELTA_BINARY_PACKED, text / lang DELTA_BYTE_ARRAY — decoded
    * value-for-value by the hand-rolled v2 path (uncompressed levels,
    * values-only snappy, num_nulls cross-check) and gated by the same
    * closed-form DuckDB columns.
    */
  val q_parquet_v2: QueryDef = QueryDef(
    s"""SELECT CAST(doc_id // $PerFile AS BIGINT) AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  'SNAPPY' AS codec,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |  md5(string_agg(text, '' ORDER BY doc_id)) AS text_md5,
       |  md5(string_agg(lang, '' ORDER BY doc_id)) AS lang_md5,
       |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS opt_nulls,
       |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN (doc_id * 37 + 11) % 1000 END) AS BIGINT) AS opt_sum
       |FROM documents
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      // streaming group decode — one group buffered at a time, not the
      // whole partition's groups in an agg buffer (DecodeStage.groupConsecutive)
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        DecodeStage.groupConsecutive(it,
          (r: (Long, String, String)) => java.lang.Math.floorDiv(r._1, PerFile))
        .map { case (fileId, docs) =>
          val ctx = s"file $fileId"
          val bytes = writeViaParquetMr(docs, v2 = true, dictionary = false)
          val (m, cols) = readAll(ctx, bytes)
          if (m.numRows != docs.size) throw new IllegalStateException(
            s"$ctx: wrote ${docs.size} rows, footer says ${m.numRows}")
          def chunk(p: String): DecodedChunk = cols.getOrElse(p,
            throw new IllegalStateException(s"$ctx: no decoded chunk for $p"))
          val ids = chunk("doc_id").values.map(_.asInstanceOf[Long])
          val texts = chunk("text").values.map(_.asInstanceOf[Array[Byte]])
          val langs = chunk("lang").values.map(_.asInstanceOf[Array[Byte]])
          val opts = chunk("opt_len").values
          if (chunk("doc_id").dictEntries.nonEmpty) throw new IllegalStateException(
            s"$ctx: dictionary page on a dictionary-off v2 file")
          val codec = m.groups.head.chunks.map(_.codec).distinct match {
            case Vector(c) => c
            case other => throw new IllegalStateException(s"$ctx: mixed codecs $other")
          }
          val textCat = new java.io.ByteArrayOutputStream()
          texts.foreach(t => textCat.write(t, 0, t.length))
          val langCat = new java.io.ByteArrayOutputStream()
          langs.foreach(l => langCat.write(l, 0, l.length))
          (fileId, ids.size.toLong, codec, ids.sum,
            md5hex(textCat.toByteArray), md5hex(langCat.toByteArray),
            opts.count(_ == null).toLong,
            opts.collect { case v: Long => v }.sum)
        }
      }
      .toDF("file_id", "n_rows", "codec", "sum_doc_id", "text_md5", "lang_md5",
        "opt_nulls", "opt_sum")
      .orderBy(col("file_id"))
  }

  /** The codec-matrix face of [[q_parquet_read]]: the SAME files
    * written by parquet-mr under ZSTD, LZ4_RAW, and legacy
    * Hadoop-framed LZ4 (the three enums `spark.write` emits for
    * zstd/lz4_raw/lz4), each decoded value-for-value by the hand-rolled
    * reader — LZ4_RAW through the hand-rolled block decoder, LZ4
    * through the Hadoop frame walk over it, ZSTD content through the
    * zstd-jni Spark ships under the H77 frame machinery. One output row
    * per (file, codec), all columns closed-form in DuckDB.
    */
  val q_parquet_codecs: QueryDef = QueryDef(
    s"""SELECT file_id, codec, n_rows, sum_doc_id, text_md5, opt_nulls, opt_sum
       |FROM (
       |  SELECT CAST(doc_id // $PerFile AS BIGINT) AS file_id,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |    md5(string_agg(text, '' ORDER BY doc_id)) AS text_md5,
       |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS opt_nulls,
       |    CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN (doc_id * 37 + 11) % 1000 END) AS BIGINT) AS opt_sum
       |  FROM documents GROUP BY 1) g
       |CROSS JOIN (SELECT unnest(['ZSTD', 'LZ4_RAW', 'LZ4']) AS codec) c
       |ORDER BY file_id, codec""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      // streaming group decode — one group buffered at a time, not the
      // whole partition's groups in an agg buffer (DecodeStage.groupConsecutive)
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        DecodeStage.groupConsecutive(it,
          (r: (Long, String, String)) => java.lang.Math.floorDiv(r._1, PerFile))
        .flatMap { case (fileId, docs) =>
          Seq("ZSTD", "LZ4_RAW", "LZ4").map { codecName =>
            val ctx = s"file $fileId/$codecName"
            val bytes = writeViaParquetMr(docs, codecName = codecName)
            val (m, cols) = readAll(ctx, bytes)
            if (m.numRows != docs.size) throw new IllegalStateException(
              s"$ctx: wrote ${docs.size} rows, footer says ${m.numRows}")
            val seen = m.groups.head.chunks.map(_.codec).distinct
            if (seen != Vector(codecName)) throw new IllegalStateException(
              s"$ctx: expected codec $codecName, footer says $seen")
            def chunk(p: String): DecodedChunk = cols.getOrElse(p,
              throw new IllegalStateException(s"$ctx: no decoded chunk for $p"))
            val ids = chunk("doc_id").values.map(_.asInstanceOf[Long])
            val texts = chunk("text").values.map(_.asInstanceOf[Array[Byte]])
            val opts = chunk("opt_len").values
            if (ids.size != docs.size || texts.size != docs.size || opts.size != docs.size)
              throw new IllegalStateException(s"$ctx: decoded column lengths " +
                s"${ids.size}/${texts.size}/${opts.size} != ${docs.size}")
            val textCat = new java.io.ByteArrayOutputStream()
            texts.foreach(t => textCat.write(t, 0, t.length))
            (fileId, codecName, ids.size.toLong, ids.sum,
              md5hex(textCat.toByteArray),
              opts.count(_ == null).toLong,
              opts.collect { case v: Long => v }.sum)
          }
        }
      }
      .toDF("file_id", "codec", "n_rows", "sum_doc_id", "text_md5",
        "opt_nulls", "opt_sum")
      .orderBy(col("file_id"), col("codec"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_parquet_read" -> q_parquet_read,
    "q_parquet_v2" -> q_parquet_v2,
    "q_parquet_codecs" -> q_parquet_codecs)
}
