package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.zip.{CRC32, GZIPOutputStream, Inflater}

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** WARC (Web ARChive, ISO 28500) ingestion — the container CommonCrawl
  * ships, i.e. THE on-disk format a web-scale LLM corpus starts from.
  * Both halves real: the encoder writes each record as an independent
  * gzip member (CommonCrawl's layout, enabling per-record random access)
  * through the JDK's real DEFLATE ([[GZIPOutputStream]]); the reader
  * decompresses the member-concatenated stream ([[GZIPInputStream]]
  * walks members transparently) and frames records by `Content-Length`
  * — never by delimiter scanning, so payloads containing `\r\n\r\n` or
  * even a literal `WARC/1.0` line round-trip exactly (the framing
  * mistake naive WARC readers make). Header walk is byte-exact:
  * version line, required headers (WARC-Type, WARC-Record-ID,
  * WARC-Target-URI, Content-Length), the two-CRLF record terminator;
  * any deviation — truncated gzip, bad version, missing/negative
  * Content-Length, short payload, missing terminator — fails LOUDLY
  * with the decompressed-stream offset (the MediaDecoder contract).
  *
  * [[q_warc_roundtrip]] gates the whole path: documents become 8-record
  * WARC files, every record its own gzip member, parsed back to (uri,
  * content length, payload md5, decompressed byte offset) — the offset
  * column is the CDX-index arithmetic, recomputed by the oracle as a
  * running sum of the exact per-record byte sizes.
  *
  * Scale shape: one bounded per-group aggregation (8 docs/file), one
  * mapPartitions compress+parse pass, zero further shuffles — at 100 TB
  * WARC encode/decode is embarrassingly parallel over files, exactly
  * how CommonCrawl is processed in practice.
  */
object Warc {

  /** One parsed record: identifying headers, the framed payload, and
    * where the record starts in the DECOMPRESSED stream (CDX use case).
    */
  final case class Record(uri: String, id: String, contentLength: Int,
      payload: Array[Byte], offset: Long)

  private val Crlf = "\r\n"

  /** Encode records as member-per-record gzip WARC (CommonCrawl layout). */
  def encodeWarc(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (uri, id, payload) =>
      val head = new StringBuilder()
        .append("WARC/1.0").append(Crlf)
        .append("WARC-Type: response").append(Crlf)
        .append("WARC-Record-ID: ").append(id).append(Crlf)
        .append("WARC-Target-URI: ").append(uri).append(Crlf)
        .append("Content-Length: ").append(payload.length).append(Crlf)
        .append(Crlf)
      val gz = new GZIPOutputStream(out)
      gz.write(head.toString.getBytes(UTF_8))
      gz.write(payload)
      gz.write((Crlf + Crlf).getBytes(UTF_8))
      gz.close() // ends the member AND the Deflater's native context
      // (ByteArrayOutputStream.close() is a no-op, so the sink survives)
    }
    out.toByteArray
  }

  /** Decompress the member-concatenated gzip stream with an explicit
    * member walk (NOT GZIPInputStream, which silently swallows a corrupt
    * or truncated later member and hands back a prefix): each member's
    * 10-byte header is parsed by hand, the deflate body runs through a
    * raw [[Inflater]], and the CRC32 + ISIZE trailer is VERIFIED, so
    * corruption anywhere in the file fails loudly with the compressed
    * offset instead of silently dropping tail records during ingest.
    */
  private def gunzipMembers(docId: Long, b: Array[Byte]): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: WARC gzip member at compressed byte $off: $why")
    val out = new ByteArrayOutputStream()
    var pos = 0
    while (pos < b.length) {
      val at = pos
      if (pos + 10 > b.length) fail(at, "truncated member header")
      if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b)
        fail(at, "bad gzip magic")
      if ((b(pos + 2) & 0xff) != 8) fail(at, s"compression method ${b(pos + 2)} != deflate")
      val flg = b(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (pos + 2 > b.length) fail(at, "truncated FEXTRA length")
        val xlen = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (pos < b.length && b(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (pos < b.length && b(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2 // FHCRC
      if (pos > b.length) fail(at, "truncated member header fields")
      val inf = new Inflater(true)
      try {
        inf.setInput(b, pos, b.length - pos)
        val crc = new CRC32()
        val chunk = new Array[Byte](8192)
        var isize = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(chunk)
            catch { case e: java.util.zip.DataFormatException =>
              fail(at, s"deflate data corrupt: ${e.getMessage}")
            }
          if (n == 0 && !inf.finished()) fail(at, "deflate stream truncated")
          out.write(chunk, 0, n)
          crc.update(chunk, 0, n)
          isize += n
        }
        val consumed = (b.length - pos) - inf.getRemaining
        val tAt = pos + consumed
        if (tAt + 8 > b.length) fail(tAt, "truncated member trailer")
        def le32(p: Int): Long = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
        if (le32(tAt) != crc.getValue) fail(tAt, "member CRC32 mismatch")
        if (le32(tAt + 4) != (isize & 0xffffffffL)) fail(tAt + 4, "member ISIZE mismatch")
        pos = tAt + 8
      } finally inf.end()
    }
    out.toByteArray
  }

  /** Decompress (multi-member, verified) + parse by Content-Length framing. */
  def parseWarc(docId: Long, b: Array[Byte]): Vector[Record] =
    parseWarcRecords(docId, gunzipMembers(docId, b))

  /** The Content-Length record framing over an ALREADY-decompressed
    * stream — shared by the gzip-member reader above and the
    * zstd-member reader ([[ZstdCodec.parseWarcZstd]], the `.warc.zst`
    * layout).
    */
  private[ext] def parseWarcRecords(docId: Long, bytes: Array[Byte]): Vector[Record] = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: WARC parse at decompressed byte $off: $why")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= bytes.length) fail(start, "header line without CRLF")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 2
      s
    }
    val recs = Vector.newBuilder[Record]
    while (pos < bytes.length) {
      val at = pos.toLong
      val version = line()
      if (version != "WARC/1.0") fail(at, s"bad version line '$version'")
      var uri: String = null
      var id: String = null
      var len = -1
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(": ")
        if (i < 0) fail(at, s"malformed header '$h'")
        val (k, v) = (h.substring(0, i), h.substring(i + 2))
        k match {
          case "WARC-Target-URI" => uri = v
          case "WARC-Record-ID" => id = v
          case "Content-Length" =>
            len = try v.toInt catch {
              case _: NumberFormatException => fail(at, s"Content-Length '$v' not a number")
            }
            if (len < 0) fail(at, s"negative Content-Length $len")
          case _ => () // optional headers tolerated (real files carry many)
        }
        h = line()
      }
      if (uri == null) fail(at, "missing WARC-Target-URI")
      if (id == null) fail(at, "missing WARC-Record-ID")
      if (len < 0) fail(at, "missing Content-Length")
      if (len > bytes.length - pos - 4) fail(at, s"payload of $len bytes truncated")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
          bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
        fail(pos.toLong, "record terminator (CRLFCRLF) missing")
      pos += 4
      recs += Record(uri, id, len, payload, at)
    }
    recs.result()
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val PerFile = 8

  /** The fixed byte overhead of one record around its variable parts
    * (version line + 4 headers + separators + terminator): everything
    * except len(id) + len(uri) + digits(Content-Length) + payload.
    */
  private[ext] val RecFixed = 92

  /** Documents → 8-record member-per-record gzip WARC files → REAL
    * decompress + framed parse back. Output gates the payload bytes
    * (md5), the framing (content_length) and the CDX offset arithmetic
    * (running sum of exact record sizes), all recomputed closed-form by
    * DuckDB from the same documents.
    */
  val q_warc_roundtrip: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerFile AS wf, text,
       |    octet_length(encode(text)) AS plen,
       |    'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       |    'urn:doc:' || CAST(doc_id AS VARCHAR) AS rid
       |  FROM documents),
       |z AS (SELECT *, $RecFixed + length(rid) + length(uri)
       |    + length(CAST(plen AS VARCHAR)) + plen AS rec_bytes
       |  FROM d)
       |SELECT doc_id, CAST(wf AS BIGINT) AS warc_file, uri,
       |  CAST(count(*) OVER (PARTITION BY wf) AS BIGINT) AS n_records,
       |  CAST(plen AS BIGINT) AS content_length,
       |  md5(text) AS payload_md5,
       |  CAST(coalesce(sum(rec_bytes) OVER (PARTITION BY wf ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset
       |FROM z
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      .groupBy(expr(s"doc_id div $PerFile").as("wf"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("text").as("_2")))).as("docs"))
      .as[(Long, Seq[(Long, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (wf, docs) =>
          val recs = docs.map { case (id, text) =>
            (s"https://example.org/doc/$id", s"urn:doc:$id", text.getBytes(UTF_8))
          }
          val warc = encodeWarc(recs)
          val parsed = parseWarc(wf, warc)
          if (parsed.size != docs.size)
            throw new IllegalStateException(
              s"warc file $wf: ${docs.size} in, ${parsed.size} out")
          parsed.map { r =>
            md.reset()
            val hex = md.digest(r.payload).map("%02x".format(_)).mkString
            val docId = r.uri.substring(r.uri.lastIndexOf('/') + 1).toLong
            (docId, wf, r.uri, parsed.size.toLong, r.contentLength.toLong,
              hex, r.offset)
          }
        }
      }
      .toDF("doc_id", "warc_file", "uri", "n_records", "content_length",
        "payload_md5", "rec_offset")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_warc_roundtrip" -> q_warc_roundtrip)
}
