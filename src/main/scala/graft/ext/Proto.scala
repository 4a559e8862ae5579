package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Protobuf wire-format decode — the OTHER Confluent Schema Registry
  * serialization (H78 covers Avro): production registries serve
  * protobuf topics framed as magic byte 0x00, a 4-byte big-endian
  * schema id, a varint message-index list (the single byte 0x00 for the
  * first message type), then the protobuf binary. The message layer
  * here is a HAND-ROLLED walk of the public Protocol Buffers encoding
  * spec (developers.google.com/protocol-buffers/docs/encoding):
  * base-128 varints (10-byte two's-complement for negative int64),
  * zigzag sint64, little-endian fixed32/fixed64, length-delimited
  * strings/bytes/nested messages, PACKED repeated varints, and the
  * deprecated SGROUP/EGROUP framing — which the walk SKIPS with
  * balanced nesting, the spec's required behavior for unknown fields.
  * Unknown fields (a tag the reader schema doesn't know) are skipped by
  * wire type and CENSUSED (count + wire bytes), never dropped silently;
  * scalar re-occurrence follows the spec's last-one-wins merge; a
  * missing field decodes to its proto3 default. Structural damage — a
  * varint past 10 bytes, a declared length crossing the message end, an
  * unterminated group, reserved wire types 6/7, a truncated Confluent
  * header — fails LOUDLY with the byte offset (the MediaDecoder
  * contract): a consumer that guesses a resync point silently
  * mis-frames every later field.
  *
  * Cross-validation is two-directional (ProtoSpec) against the REAL
  * protobuf-java runtime (the copy Apache Spark ships relocated in
  * spark-core): messages encoded by OUR writer parse identically under
  * `UnknownFieldSet.parseFrom` (values, groups, unknown census), and
  * messages built by the real `CodedOutputStream`/`UnknownFieldSet`
  * writer decode identically under this walk — spec compliance, not
  * self-consistency.
  *
  * Scale shape: one mapPartitions encode/decode pass over the documents
  * table, zero shuffles after the scan — exactly the per-partition work
  * of a Kafka consumer at any topic size.
  */
object Proto {

  // ---- wire primitives (hand-rolled, spec §Base 128 Varints) -------------------

  /** Unsigned base-128 varint: 7 payload bits per byte, continuation in
    * the high bit; a negative long rides as its full 10-byte
    * two's-complement (the spec's int64 rule).
    */
  def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Byte length of the unsigned varint encoding (closed-form oracles). */
  def varintLen(value: Long): Int = {
    var v = value
    var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Append-only message writer: tags, scalars, length-delimited fields,
    * packed varints, nested messages and (for the skip-path spec legs)
    * deprecated groups.
    */
  final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def tag(field: Int, wire: Int): this.type = {
      writeVarint(out, (field.toLong << 3) | wire); this
    }
    def int64(field: Int, v: Long): this.type = { tag(field, 0); writeVarint(out, v); this }
    def sint64(field: Int, v: Long): this.type = { tag(field, 0); writeVarint(out, zigzag(v)); this }
    def fixed64(field: Int, v: Long): this.type = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def fixed32(field: Int, v: Int): this.type = {
      tag(field, 5)
      var i = 0
      while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
      this
    }
    def bytes(field: Int, b: Array[Byte]): this.type = {
      tag(field, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length); this
    }
    def string(field: Int, s: String): this.type = bytes(field, s.getBytes(UTF_8))
    def packedVarints(field: Int, vs: Seq[Long]): this.type = {
      val body = new java.io.ByteArrayOutputStream()
      vs.foreach(writeVarint(body, _))
      bytes(field, body.toByteArray)
    }
    def nested(field: Int)(body: Writer => Unit): this.type = {
      val w = new Writer; body(w); bytes(field, w.out.toByteArray)
    }
    /** Deprecated group framing: SGROUP(3) tag, body, EGROUP(4) tag. */
    def group(field: Int)(body: Writer => Unit): this.type = {
      tag(field, 3)
      val w = new Writer; body(w)
      val b = w.out.toByteArray; out.write(b, 0, b.length)
      tag(field, 4)
    }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  // ---- the wire reader ----------------------------------------------------------

  final class Reader(docId: Long, b: Array[Byte], var pos: Int, val end: Int) {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: proto parse at byte $off: $why")
    def readVarint(): Long = {
      val at = pos
      var shift = 0
      var acc = 0L
      while (true) {
        if (pos >= end) fail(at, "varint truncated")
        if (shift >= 70) fail(at, "varint longer than 10 bytes")
        val byte = b(pos) & 0xff
        pos += 1
        acc |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return acc
        shift += 7
      }
      acc // unreachable
    }
    def readFixed(n: Int): Long = {
      val at = pos
      if (pos + n > end) fail(at, s"fixed$n truncated")
      var v = 0L
      var i = 0
      while (i < n) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n
      v
    }
    def readLenDelimited(): (Int, Int) = {
      val at = pos
      val len = readVarint()
      if (len < 0 || pos + len > end) fail(at,
        s"declared length $len crosses the message end (${end - pos} bytes remain)")
      val from = pos
      pos += len.toInt
      (from, len.toInt)
    }
    def slice(from: Int, len: Int): Array[Byte] = java.util.Arrays.copyOfRange(b, from, from + len)
    def utf8(from: Int, len: Int): String = new String(b, from, len, UTF_8)
    def atEnd: Boolean = pos == end

    /** Skip one value of wire type `wire`; groups recurse with balanced
      * nesting (spec: an unknown group is skipped to its matching
      * EGROUP of the SAME field number).
      */
    def skip(field: Int, wire: Int, depth: Int = 0): Unit = {
      if (depth > 32) fail(pos, "group nesting deeper than 32")
      wire match {
        case 0 => readVarint(): Unit
        case 1 => readFixed(8): Unit
        case 2 => readLenDelimited(): Unit
        case 3 => // SGROUP: skip until this field's EGROUP
          var done = false
          while (!done) {
            if (pos >= end) fail(pos, s"group of field $field unterminated")
            val key = readVarint()
            val f = (key >>> 3).toInt
            val w = (key & 7).toInt
            if (w == 4) {
              if (f != field) fail(pos, s"group end field $f != start field $field")
              done = true
            } else skip(f, w, depth + 1)
          }
        case 4 => fail(pos, s"unmatched group end for field $field")
        case w => fail(pos, s"reserved wire type $w on field $field")
      }
    }
  }

  // ---- the demo message (the q_avro_decode Doc, protobuf edition) ---------------

  /** message DocEvent {
    *   int64 id = 1; sint64 delta = 2; string text = 3; string lang = 4;
    *   repeated uint32 tags = 5 [packed]; fixed64 ts = 6; fixed32 score = 7;
    *   message Meta { uint64 chars = 1; uint64 lang_len = 2; }  Meta meta = 8;
    * }
    * Field 1000 (a string the reader schema does NOT know) exercises the
    * unknown-field skip + census path on every row.
    */
  final case class DocEvent(id: Long, delta: Long, text: String, lang: String,
      tags: Seq[Long], ts: Long, score: Long, chars: Long, langLen: Long,
      unknownFields: Int, unknownBytes: Int)

  val SchemaId = 9
  private val UnknownField = 1000

  def encodeDocEvent(id: Long, delta: Long, text: String, lang: String,
      tags: Seq[Long], ts: Long, score: Int, unknownLen: Int): Array[Byte] = {
    val textBytes = text.getBytes(UTF_8)
    val langBytes = lang.getBytes(UTF_8)
    new Writer()
      .int64(1, id)
      .sint64(2, delta)
      .bytes(3, textBytes)
      .bytes(4, langBytes)
      .packedVarints(5, tags)
      .fixed64(6, ts)
      .fixed32(7, score)
      .nested(8)(m => m.int64(1, textBytes.length.toLong)
        .int64(2, langBytes.length.toLong))
      .string(UnknownField, "u" * unknownLen)
      .toByteArray
  }

  /** Decode a DocEvent: known fields dispatch by (field, wire) with the
    * spec's last-one-wins scalar merge and proto3 defaults for absent
    * fields; anything else is skipped by wire type and censused.
    */
  def decodeDocEvent(docId: Long, b: Array[Byte], from: Int, to: Int): DocEvent = {
    val r = new Reader(docId, b, from, to)
    var id, delta, ts, score, chars, langLen = 0L
    var text, lang = ""
    var tags = Vector.empty[Long]
    var uf, ub = 0
    while (!r.atEnd) {
      val tagAt = r.pos
      val key = r.readVarint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (field <= 0) r.fail(tagAt, s"illegal field number $field")
      (field, wire) match {
        case (1, 0) => id = r.readVarint()
        case (2, 0) => delta = unzigzag(r.readVarint())
        case (3, 2) => val (f, n) = r.readLenDelimited(); text = r.utf8(f, n)
        case (4, 2) => val (f, n) = r.readLenDelimited(); lang = r.utf8(f, n)
        case (5, 2) => // packed repeated: spec says concatenate across occurrences
          val (f, n) = r.readLenDelimited()
          val pr = new Reader(docId, b, f, f + n)
          while (!pr.atEnd) tags :+= pr.readVarint()
        case (5, 0) => tags :+= r.readVarint() // unpacked occurrence, same field
        case (6, 1) => ts = r.readFixed(8)
        case (7, 5) => score = r.readFixed(4)
        case (8, 2) =>
          val (f, n) = r.readLenDelimited()
          val mr = new Reader(docId, b, f, f + n)
          while (!mr.atEnd) {
            val mkey = mr.readVarint()
            ((mkey >>> 3).toInt, (mkey & 7).toInt) match {
              case (1, 0) => chars = mr.readVarint()
              case (2, 0) => langLen = mr.readVarint()
              case (mf, mw) => mr.skip(mf, mw)
            }
          }
        case (f, w) => // unknown (or wrong-wire) field: skip + census
          r.skip(f, w)
          uf += 1
          ub += r.pos - tagAt
      }
    }
    DocEvent(id, delta, text, lang, tags, ts, score, chars, langLen, uf, ub)
  }

  // ---- Confluent protobuf envelope ----------------------------------------------

  /** magic 0x00 | schema id (4B big-endian) | message-index list (the
    * single byte 0x00 abbreviates [0], the registry's rule for the
    * first message type in the schema) | protobuf binary.
    */
  def encodeEnvelope(schemaId: Int, msg: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(msg.length + 6)
    out.write(0)
    out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
    out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
    out.write(0) // message-indexes: [0]
    out.write(msg, 0, msg.length)
    out.toByteArray
  }

  def decodeEnvelope(docId: Long, b: Array[Byte]): (Int, DocEvent) = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: proto parse at byte $off: $why")
    if (b.length < 6) fail(0, s"Confluent header needs 6 bytes, got ${b.length}")
    if (b(0) != 0) fail(0, f"bad magic 0x${b(0)}%02x (want 0x00)")
    val schemaId = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    val r = new Reader(docId, b, 5, b.length)
    val nIdx = unzigzag(r.readVarint()) // 0x00 abbreviation decodes as count 0 = [0]
    if (nIdx < 0 || nIdx > 16) fail(5, s"message-index count $nIdx out of range")
    var i = 0L
    while (i < nIdx) { unzigzag(r.readVarint()); i += 1 }
    (schemaId, decodeDocEvent(docId, b, r.pos, b.length))
  }

  // ---- q_proto_decode ------------------------------------------------------------

  /** Unsigned-varint byte-width ladder (no zigzag — protobuf int64 of a
    * non-negative value rides raw).
    */
  private def sqlVarU(col: String): String =
    s"""CASE WHEN $col < 128 THEN 1 WHEN $col < 16384 THEN 2
       | WHEN $col < 2097152 THEN 3 WHEN $col < 268435456 THEN 4
       | WHEN $col < 34359738368 THEN 5 WHEN $col < 4398046511104 THEN 6
       | WHEN $col < 562949953421312 THEN 7
       | WHEN $col < 72057594037927936 THEN 8
       | ELSE 9 END""".stripMargin.replace("\n", "")

  /** Per-document Confluent-protobuf envelopes encoded AND decoded by
    * the hand-rolled codec; the oracle recomputes every decoded field
    * and the exact envelope byte length — 6 header bytes plus the
    * varint/zigzag width arithmetic — closed-form from the documents
    * table (the q_avro_decode shape).
    */
  val q_proto_decode: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, text, lang,
       |    octet_length(encode(text)) AS plen,
       |    octet_length(encode(lang)) AS clen,
       |    (doc_id * 7) % 201 - 100 AS delta,
       |    doc_id % 5 AS ulen
       |  FROM documents),
       |e AS (SELECT *,
       |    CASE WHEN delta >= 0 THEN 2 * delta ELSE -2 * delta - 1 END AS zz,
       |    1 + ${sqlVarU("plen")} + 1 + ${sqlVarU("clen")} AS meta_len
       |  FROM d)
       |SELECT doc_id, CAST($SchemaId AS INT) AS schema_id,
       |  CAST(delta AS BIGINT) AS delta,
       |  md5(text) AS text_md5, lang,
       |  CAST(doc_id % 7 + doc_id % 13 + doc_id % 31 AS BIGINT) AS tags_sum,
       |  CAST(doc_id * 1000003 AS BIGINT) AS ts,
       |  CAST(doc_id % 90001 AS BIGINT) AS score,
       |  CAST(plen AS BIGINT) AS chars,
       |  CAST(1 AS INT) AS unknown_fields,
       |  CAST(2 + 1 + ulen AS INT) AS unknown_bytes,
       |  CAST(6
       |    + 1 + ${sqlVarU("doc_id")}
       |    + 1 + ${sqlVarU("zz")}
       |    + 1 + ${sqlVarU("plen")} + plen
       |    + 1 + ${sqlVarU("clen")} + clen
       |    + 1 + 1 + 3
       |    + 1 + 8 + 1 + 4
       |    + 1 + ${sqlVarU("meta_len")} + meta_len
       |    + 2 + 1 + ulen
       |    AS BIGINT) AS envelope_bytes
       |FROM e
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text, lang) =>
          val msg = encodeDocEvent(id, delta = (id * 7) % 201 - 100, text, lang,
            tags = Seq(id % 7, id % 13, id % 31), ts = id * 1000003,
            score = (id % 90001).toInt, unknownLen = (id % 5).toInt)
          val env = encodeEnvelope(SchemaId, msg)
          val (sid, ev) = decodeEnvelope(id, env)
          md.reset()
          val hex = md.digest(ev.text.getBytes(UTF_8)).map("%02x".format(_)).mkString
          (ev.id, sid, ev.delta, hex, ev.lang, ev.tags.sum, ev.ts, ev.score,
            ev.chars, ev.unknownFields, ev.unknownBytes, env.length.toLong)
        }
      }
      .toDF("doc_id", "schema_id", "delta", "text_md5", "lang", "tags_sum",
        "ts", "score", "chars", "unknown_fields", "unknown_bytes",
        "envelope_bytes")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_proto_decode" -> q_proto_decode)
}
