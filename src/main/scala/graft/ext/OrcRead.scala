package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** ORC STRIPE-DATA reader — the value half of the H84 footer walk
  * (OrcLite), completing the hand-rolled read stack for the second
  * lake format: decode the rows of real ORC files (orc-core- and
  * Spark-written) through hand-rolled decoders of the public spec's
  * stream encodings:
  *
  *  - **StripeFooter** (protobuf via the H80 generic walk, chunk-
  *    deframed like every ORC stream): the stream directory (kind /
  *    column / length — offsets are CUMULATIVE in list order from the
  *    stripe start, index streams first) and per-column encodings
  *    (DIRECT_V2 / DICTIONARY_V2; the RLEv1 kinds fail loudly);
  *  - **RLEv2**, all four sub-encodings: SHORT_REPEAT (3-bit width,
  *    big-endian value, 3..10 run), DIRECT (5-bit closed width table,
  *    MSB-first big-endian bit packing), DELTA (base varint, signed
  *    delta-base varint, monotone packed delta magnitudes, fixed-delta
  *    when the width code is 0), and PATCHED_BASE (sign-magnitude
  *    big-endian base, packed data words, a patch list of
  *    (gap, patch) entries at the closest fixed width, 255-gap
  *    zero-patch skip entries) — zigzag applied per stream signedness;
  *  - **Boolean RLE** for PRESENT streams: byte-RLE (control 0..127 =
  *    run of 3..130, -1..-128 = literal) over MSB-first bit-packed
  *    bytes;
  *  - **string columns** both ways: DIRECT_V2 (LENGTH = unsigned
  *    RLEv2, DATA = concatenated UTF-8) and DICTIONARY_V2 (sorted
  *    dictionary from DICTIONARY_DATA + LENGTH, DATA = unsigned RLEv2
  *    indices).
  *
  * Every structural violation fails LOUDLY with the byte offset:
  * unknown sub-encoding headers, packed runs crossing the stream end,
  * RLEv1 column encodings, missing streams, value counts that do not
  * land exactly, dictionary indices out of range.
  *
  * Cross-validated in OrcReadSpec against the ORC spec's own published
  * worked byte examples (SHORT_REPEAT / DIRECT / DELTA / PATCHED_BASE
  * golden vectors decode exactly), and file-level against the real
  * stack: spark.write.orc files under zlib/snappy/zstd/none decode
  * ROW-IDENTICAL to spark.read (nulls, both string encodings), and
  * value patterns chosen to force each RLEv2 sub-encoding round-trip
  * through orc-core's writer.
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * pass, zero post-decode shuffles; a stripe is read strictly
  * sequentially per stream — the executor-side I/O profile of a real
  * ORC scan.
  */
object OrcRead {

  // ---- RLEv2 ------------------------------------------------------------------------

  private val FbwTable: Array[Int] =
    ((1 to 24) ++ Seq(26, 28, 30, 32, 40, 48, 56, 64)).toArray

  def decodeBitWidth(ctx: String, code: Int): Int =
    if (code >= 0 && code < 32) FbwTable(code)
    else throw new IllegalArgumentException(s"$ctx: RLEv2 width code $code")

  /** Read `n` big-endian MSB-first bit-packed values of `width` bits. */
  private def readPackedBE(ctx: String, b: Array[Byte], from: Int, end: Int,
      width: Int, n: Int): (Array[Long], Int) = {
    val nbytes = (n.toLong * width + 7) / 8
    if (from + nbytes > end) throw new IllegalArgumentException(
      s"$ctx: RLEv2 decode at byte $from: packed run of $n x $width bits crosses the stream end")
    val out = new Array[Long](n)
    var bitPos = from.toLong * 8
    var i = 0
    while (i < n) {
      var v = 0L
      var got = 0
      while (got < width) {
        val byteAt = (bitPos / 8).toInt
        val bitAt = (bitPos % 8).toInt
        val avail = 8 - bitAt
        val use = math.min(avail, width - got)
        val bits = ((b(byteAt) & 0xff) >>> (avail - use)) & ((1 << use) - 1)
        v = (v << use) | bits
        got += use
        bitPos += use
      }
      out(i) = v
      i += 1
    }
    (out, from + nbytes.toInt)
  }

  /** Decode exactly `n` RLEv2 values from `b[from, end)`; `signed`
    * applies value-level zigzag (DATA of signed integer columns) —
    * LENGTH / dictionary-index streams are unsigned.
    */
  def rleV2(ctx: String, b: Array[Byte], from: Int, end: Int,
      signed: Boolean, n: Int): Array[Long] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: RLEv2 decode at byte $off: $why")
    val out = new Array[Long](n)
    var k = 0
    var pos = from
    def u8(): Int = {
      if (pos >= end) fail(pos, "header truncated")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def varintU(): Long = {
      val at = pos
      var shift = 0
      var acc = 0L
      while (true) {
        if (shift >= 70) fail(at, "varint longer than 10 bytes")
        val byte = u8()
        acc |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return acc
        shift += 7
      }
      0L // unreachable
    }
    def zig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    def beN(w: Int): Long = {
      if (pos + w > end) fail(pos, s"$w-byte big-endian value truncated")
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += w
      v
    }
    while (k < n) {
      val at = pos
      val h = u8()
      (h >>> 6) & 3 match {
        case 0 => // SHORT_REPEAT
          val w = ((h >>> 3) & 7) + 1
          val run = (h & 7) + 3
          if (k + run > n) fail(at, s"short-repeat run of $run overruns the $n declared values at $k")
          var v = beN(w)
          if (signed) v = zig(v)
          var i = 0
          while (i < run) { out(k) = v; k += 1; i += 1 }
        case 1 => // DIRECT
          val width = decodeBitWidth(ctx, (h >>> 1) & 31)
          val len = (((h & 1) << 8) | u8()) + 1
          if (k + len > n) fail(at, s"direct run of $len overruns the $n declared values at $k")
          val (vs, next) = readPackedBE(ctx, b, pos, end, width, len)
          pos = next
          var i = 0
          while (i < len) { out(k) = if (signed) zig(vs(i)) else vs(i); k += 1; i += 1 }
        case 3 => // DELTA
          val wcode = (h >>> 1) & 31
          val len = (((h & 1) << 8) | u8()) + 1
          if (k + len > n) fail(at, s"delta run of $len overruns the $n declared values at $k")
          val base = { val v = varintU(); if (signed) zig(v) else v }
          val deltaBase = zig(varintU()) // always signed
          out(k) = base; k += 1
          if (len >= 2) { out(k) = base + deltaBase; k += 1 }
          if (wcode == 0) { // fixed delta
            var i = 2
            while (i < len) { out(k) = out(k - 1) + deltaBase; k += 1; i += 1 }
          } else {
            val width = decodeBitWidth(ctx, wcode)
            val (ds, next) = readPackedBE(ctx, b, pos, end, width, len - 2)
            pos = next
            val sign = if (deltaBase < 0) -1L else 1L
            var i = 0
            while (i < len - 2) { out(k) = out(k - 1) + sign * ds(i); k += 1; i += 1 }
          }
        case 2 => // PATCHED_BASE
          val width = decodeBitWidth(ctx, (h >>> 1) & 31)
          val len = (((h & 1) << 8) | u8()) + 1
          if (k + len > n) fail(at, s"patched-base run of $len overruns the $n declared values at $k")
          val b3 = u8()
          val bw = ((b3 >>> 5) & 7) + 1 // base width, bytes
          val pw = decodeBitWidth(ctx, b3 & 31) // patch value width, bits
          val b4 = u8()
          val pgw = ((b4 >>> 5) & 7) + 1 // patch gap width, bits
          val pll = b4 & 31 // patch list length
          var base = beN(bw)
          val signMask = 1L << (bw * 8 - 1)
          if ((base & signMask) != 0) base = -(base & (signMask - 1)) // sign-magnitude
          val (vs, next) = readPackedBE(ctx, b, pos, end, width, len)
          pos = next
          if (pll > 0) {
            if (pgw + pw > 64) fail(at, s"patch gap+value width ${pgw + pw} exceeds 64")
            val cfb = {
              var c = 0
              while (FbwTable(c) < pgw + pw) c += 1
              FbwTable(c)
            }
            val (patches, next2) = readPackedBE(ctx, b, pos, end, cfb, pll)
            pos = next2
            var idx = 0 // gaps are cumulative from position 0 (first index = first gap)
            var i = 0
            while (i < pll) {
              val gap = (patches(i) >>> pw).toInt
              val patch = patches(i) & ((1L << pw) - 1)
              idx += gap
              if (patch != 0) { // gap-255 skip entries carry patch 0
                if (idx < 0 || idx >= len) fail(at, s"patch index $idx outside the $len-value run")
                vs(idx) |= patch << width
              } else if (gap != 255) fail(at, s"zero patch with gap $gap (only 255-gap skips carry 0)")
              i += 1
            }
          }
          var i = 0
          while (i < len) { out(k) = base + vs(i); k += 1; i += 1 }
      }
    }
    out
  }

  // ---- boolean / byte RLE (PRESENT streams) -------------------------------------------

  /** ORC byte-RLE: control 0..127 = run of (control+3) copies of the
    * next byte; control 128..255 = (256-control) literal bytes.
    */
  def byteRle(ctx: String, b: Array[Byte], from: Int, end: Int, n: Int): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: byte-RLE decode at byte $off: $why")
    val out = new Array[Byte](n)
    var k = 0
    var pos = from
    while (k < n) {
      if (pos >= end) fail(pos, "control byte truncated")
      val c = b(pos) & 0xff; pos += 1
      if (c < 128) {
        val run = c + 3
        if (pos >= end) fail(pos, "run value truncated")
        if (k + run > n) fail(pos, s"byte run of $run overruns the $n declared bytes at $k")
        val v = b(pos); pos += 1
        var i = 0
        while (i < run) { out(k) = v; k += 1; i += 1 }
      } else {
        val lit = 256 - c
        if (pos + lit > end) fail(pos, s"literal of $lit crosses the stream end")
        val take = math.min(lit, n - k)
        System.arraycopy(b, pos, out, k, take)
        if (take < lit) fail(pos, s"literal of $lit overruns the $n declared bytes at $k")
        pos += lit; k += lit
      }
    }
    out
  }

  /** PRESENT stream: byte-RLE over MSB-first bit-packed booleans; the
    * final byte may pad past `n`.
    */
  def presentBits(ctx: String, b: Array[Byte], from: Int, end: Int, n: Int): Array[Boolean] = {
    val bytes = byteRle(ctx, b, from, end, (n + 7) / 8)
    val out = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(i / 8) >> (7 - (i % 8))) & 1) == 1
      i += 1
    }
    out
  }

  // ---- the stripe reader --------------------------------------------------------------

  private val StreamKinds = Vector("PRESENT", "DATA", "LENGTH", "DICTIONARY_DATA",
    "DICTIONARY_COUNT", "SECONDARY", "ROW_INDEX", "BLOOM_FILTER", "BLOOM_FILTER_UTF8")
  private val EncodingKinds = Vector("DIRECT", "DICTIONARY", "DIRECT_V2", "DICTIONARY_V2")

  final case class StreamRef(kind: String, column: Int, offset: Long, length: Long)
  final case class ColEnc(kind: String, dictionarySize: Int)

  /** Parse one StripeFooter: the stream directory with resolved
    * offsets (cumulative in list order from the stripe start) and the
    * per-column encodings.
    */
  def parseStripeFooter(ctx: String, file: Array[Byte], stripe: OrcLite.StripeInfo,
      compression: String): (Vector[StreamRef], Vector[ColEnc]) = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: stripe at ${stripe.offset}: $why")
    val sfStart = stripe.offset + stripe.indexLength + stripe.dataLength
    if (sfStart + stripe.footerLength > file.length)
      fail(s"stripe footer of ${stripe.footerLength} crosses the file end")
    val fb = OrcLite.orcDecompress(ctx, file, sfStart.toInt,
      (sfStart + stripe.footerLength).toInt, compression)
    val sf = OrcLite.walkMessage(s"$ctx/StripeFooter", fb, 0, fb.length)
    var off = stripe.offset
    val streams = sf.msgs(1).map { s =>
      val kind = s.varint(1).getOrElse(0L).toInt
      if (kind < 0 || kind >= StreamKinds.size) fail(s"unknown stream kind $kind")
      val len = s.varint(3).getOrElse(fail("stream missing length"))
      val r = StreamRef(StreamKinds(kind), s.varint(2).getOrElse(fail("stream missing column")).toInt,
        off, len)
      off += len
      r
    }
    if (off > sfStart) fail(s"stream directory claims ${off - stripe.offset} bytes, " +
      s"index+data regions hold ${stripe.indexLength + stripe.dataLength}")
    val encs = sf.msgs(2).map { e =>
      val kind = e.varint(1).getOrElse(0L).toInt
      if (kind < 0 || kind >= EncodingKinds.size) fail(s"unknown column encoding $kind")
      ColEnc(EncodingKinds(kind), e.varint(2).getOrElse(0L).toInt)
    }
    (streams, encs)
  }

  /** Decode every value of the flat (non-nested) columns of one ORC
    * file: bigint and string leaves, nulls via PRESENT. Returns values
    * per column index (1-based, matching the type tree).
    */
  def readAllOrc(ctx: String, file: Array[Byte]): (OrcLite.OrcMeta, Map[Int, Vector[Any]]) = {
    val m = OrcLite.parseFooter(ctx, file)
    def fail(why: String): Nothing = throw new IllegalArgumentException(s"$ctx: $why")
    if (m.types.isEmpty || m.types.head.kind != "STRUCT") fail("root type is not a struct")
    val acc = scala.collection.mutable.Map.empty[Int, Vector[Any]]
    m.types.head.subtypes.foreach(c => acc(c) = Vector.empty)
    m.stripes.foreach { stripe =>
      val (streams, encs) = parseStripeFooter(ctx, file, stripe, m.compression)
      val n = stripe.numberOfRows.toInt
      def streamOf(col: Int, kind: String): Option[StreamRef] =
        streams.find(s => s.column == col && s.kind == kind)
      def bytesOf(s: StreamRef): Array[Byte] =
        OrcLite.orcDecompress(ctx, file, s.offset.toInt, (s.offset + s.length).toInt,
          m.compression)
      m.types.head.subtypes.foreach { col =>
        val t = m.types(col)
        val enc = if (col < encs.size) encs(col) else fail(s"column $col has no encoding entry")
        val present: Array[Boolean] = streamOf(col, "PRESENT") match {
          case Some(s) => val b = bytesOf(s); presentBits(s"$ctx col $col", b, 0, b.length, n)
          case None => Array.fill(n)(true)
        }
        val nPresent = present.count(identity)
        val vals: Vector[Any] = t.kind match {
          case "LONG" | "INT" | "SHORT" | "BYTE" | "DATE" =>
            if (enc.kind != "DIRECT_V2") fail(s"column $col: ${enc.kind} integers " +
              "are RLEv1-era and not supported (DIRECT_V2 only)")
            val s = streamOf(col, "DATA").getOrElse(fail(s"column $col: no DATA stream"))
            val b = bytesOf(s)
            rleV2(s"$ctx col $col DATA", b, 0, b.length, signed = true, nPresent)
              .toVector.map(v => v: Any)
          case "STRING" | "VARCHAR" | "CHAR" | "BINARY" =>
            enc.kind match {
              case "DIRECT_V2" =>
                val ls = streamOf(col, "LENGTH").getOrElse(fail(s"column $col: no LENGTH stream"))
                val lb = bytesOf(ls)
                val lens = rleV2(s"$ctx col $col LENGTH", lb, 0, lb.length, signed = false, nPresent)
                val ds = streamOf(col, "DATA").getOrElse(fail(s"column $col: no DATA stream"))
                val db = bytesOf(ds)
                var at = 0L
                val out = lens.map { len =>
                  if (at + len > db.length) fail(s"column $col: string data of $len at $at " +
                    s"crosses the ${db.length}-byte DATA stream")
                  val v = new String(db, at.toInt, len.toInt, UTF_8)
                  at += len
                  v
                }
                out.toVector.map(v => v: Any)
              case "DICTIONARY_V2" =>
                val ls = streamOf(col, "LENGTH").getOrElse(fail(s"column $col: no LENGTH stream"))
                val lb = bytesOf(ls)
                val lens = rleV2(s"$ctx col $col LENGTH", lb, 0, lb.length, signed = false,
                  enc.dictionarySize)
                val dd = streamOf(col, "DICTIONARY_DATA").getOrElse(
                  fail(s"column $col: no DICTIONARY_DATA stream"))
                val db = bytesOf(dd)
                var at = 0L
                val dict = lens.map { len =>
                  val v = new String(db, at.toInt, len.toInt, UTF_8)
                  at += len
                  v
                }
                if (at != db.length) fail(s"column $col: dictionary walk left " +
                  s"${db.length - at} bytes")
                val ds = streamOf(col, "DATA").getOrElse(fail(s"column $col: no DATA stream"))
                val ib = bytesOf(ds)
                val idx = rleV2(s"$ctx col $col DATA", ib, 0, ib.length, signed = false, nPresent)
                idx.toVector.map { i =>
                  if (i < 0 || i >= dict.length) fail(s"column $col: dictionary index $i " +
                    s"of ${dict.length}")
                  dict(i.toInt): Any
                }
              case other => fail(s"column $col: string encoding $other not supported")
            }
          case other => fail(s"column $col: type $other is outside the flat-column reader")
        }
        if (vals.size != nPresent) fail(s"column $col: decoded ${vals.size} of $nPresent present")
        var vi = 0
        val rows = present.map { p =>
          if (p) { val v = vals(vi); vi += 1; v } else null
        }
        acc(col) = acc(col) ++ rows
      }
    }
    acc.foreach { case (c, vs) =>
      if (vs.size != m.numberOfRows) fail(s"column $c: ${vs.size} rows decoded, " +
        s"footer declares ${m.numberOfRows}")
    }
    (m, acc.toMap)
  }

  // ---- q_orc_read -----------------------------------------------------------------------

  private val PerFile = 100

  private def md5hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** Real orc-core files (ZLIB, a nullable bigint column) decoded
    * ROW-FOR-ROW by the hand-rolled stripe reader: per 100-doc file the
    * decoded row count, INT sum, order-sensitive md5 of the text and
    * lang streams, decoded-distinct lang count, decoded text byte
    * census, and the optional column's null census and non-null sum —
    * every column recomputed closed-form by DuckDB. doc_id (sorted
    * unique) exercises DELTA runs; text DIRECT_V2 lengths; lang the
    * sorted DICTIONARY_V2 path; opt_len the PRESENT bitmap.
    */
  val q_orc_read: QueryDef = QueryDef(
    s"""SELECT CAST(doc_id // $PerFile AS BIGINT) AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |  md5(string_agg(text, '' ORDER BY doc_id)) AS text_md5,
       |  md5(string_agg(lang, '' ORDER BY doc_id)) AS lang_md5,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
       |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS text_bytes,
       |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS opt_nulls,
       |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN (doc_id * 37 + 11) % 1000 END) AS BIGINT) AS opt_sum
       |FROM documents
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    // STREAMING group decode (guide §5, r14): the old
    // `groupBy(file).agg(sort_array(collect_list(...)))` buffered EVERY
    // group of a partition in the ObjectHashAggregate simultaneously —
    // bounded here (~100 docs/group) but at 100 TB the agg buffer holds a
    // whole file group's blobs per key on-heap. Repartition on the same
    // group key (the decode-stage sizing, DecodeStage.spread) +
    // sortWithinPartitions(doc_id) makes each group's rows CONSECUTIVE
    // and already in sort_array order (doc_id is unique and the group key
    // is monotone in doc_id), so the decode streams ONE group at a time
    // off a sort that spills gracefully. Rows and output are
    // bit-identical to the collect_list form.
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        DecodeStage.groupConsecutive(it,
          (r: (Long, String, String)) => java.lang.Math.floorDiv(r._1, PerFile))
        .map { case (fileId, docs) =>
          val ctx = s"file $fileId"
          val bytes = OrcLite.writeViaOrcCoreOpt(docs, "ZLIB")
          val (m, cols) = readAllOrc(ctx, bytes)
          if (m.numberOfRows != docs.size) throw new IllegalStateException(
            s"$ctx: wrote ${docs.size} rows, decoded ${m.numberOfRows}")
          val ids = cols(1).map(_.asInstanceOf[Long])
          val texts = cols(2).map(_.asInstanceOf[String])
          val langs = cols(3).map(_.asInstanceOf[String])
          val opts = cols(4)
          val textCat = new java.io.ByteArrayOutputStream()
          texts.foreach(t => { val b = t.getBytes(UTF_8); textCat.write(b, 0, b.length) })
          val langCat = new java.io.ByteArrayOutputStream()
          langs.foreach(l => { val b = l.getBytes(UTF_8); langCat.write(b, 0, b.length) })
          (fileId, ids.size.toLong, ids.sum,
            md5hex(textCat.toByteArray), md5hex(langCat.toByteArray),
            langs.distinct.size.toLong,
            texts.map(_.getBytes(UTF_8).length.toLong).sum,
            opts.count(_ == null).toLong,
            opts.collect { case v: Long => v }.sum)
        }
      }
      .toDF("file_id", "n_rows", "sum_doc_id", "text_md5", "lang_md5",
        "n_lang", "text_bytes", "opt_nulls", "opt_sum")
      .orderBy(col("file_id"))
  }

  val all: Map[String, QueryDef] = Map("q_orc_read" -> q_orc_read)
}
