package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.zip.Inflater

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Avro wire + container decode — the serialization the reference's own
  * domain runs on: production Kafka topics carry Confluent
  * Schema-Registry-framed Avro (magic byte 0x00, 4-byte big-endian
  * schema id, then Avro binary), and at-rest event corpora ship as Avro
  * Object Container Files (OCF). Both layers here are decoded by a
  * HAND-ROLLED walk of the public Avro 1.x specification — zigzag
  * varint longs (the wire primitive every field rides on),
  * length-prefixed UTF-8 strings, record field concatenation; the OCF
  * magic `Obj\1`, the avro-map file metadata (negative block counts
  * carry a byte size, zero terminates), `avro.schema`/`avro.codec`
  * entries, the 16-byte sync marker, per-block (count, size, payload)
  * framing with the sync VERIFIED after every block, and the deflate
  * codec inflated through the JDK's raw Inflater. Truncation, a bad
  * magic, an unknown codec, a sync-marker mismatch, varint overflow, or
  * trailing bytes each fail LOUDLY with the byte offset (the
  * MediaDecoder contract) — a consumer that resyncs by guessing
  * silently mis-frames every later event.
  *
  * Cross-validation is two-directional (AvroSpec): containers and
  * binary records written by the REAL Avro library decode identically
  * under this walk, and records/envelopes encoded by OUR writer decode
  * identically under the real `GenericDatumReader` — spec compliance,
  * not self-consistency.
  *
  * Scale shape: both queries are one bounded per-group aggregation (8
  * events per container for OCF; none for the per-message envelope) +
  * one mapPartitions encode/decode pass, zero further shuffles —
  * exactly the per-partition work of a Kafka consumer at any topic
  * size.
  */
object AvroCodec {

  /** The fixed demo record schema (id: long, text: string, lang: string). */
  val SchemaJson: String =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"text","type":"string"},
      |{"name":"lang","type":"string"}]}""".stripMargin.replace("\n", "")

  // ---- the Avro binary primitives (hand-rolled, spec §Binary Encoding) ---------

  /** Zigzag + varint encode of a long — the encoding every Avro long,
    * length and count rides on.
    */
  def writeVarLong(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63) // zigzag
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Byte length of the varint encoding (for closed-form oracles). */
  def varLongLen(value: Long): Int = {
    var v = (value << 1) ^ (value >> 63)
    var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  final class Reader(docId: Long, b: Array[Byte], var pos: Int) {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: avro parse at byte $off: $why")
    def readVarLong(): Long = {
      val at = pos
      var shift = 0
      var acc = 0L
      var more = true
      while (more) {
        if (pos >= b.length) fail(at, "truncated varint")
        if (shift > 63) fail(at, "varint overflows a long")
        val byte = b(pos) & 0xff
        pos += 1
        acc |= (byte & 0x7fL) << shift
        shift += 7
        more = (byte & 0x80) != 0
      }
      (acc >>> 1) ^ -(acc & 1L) // un-zigzag
    }
    def readBytes(n: Long): Array[Byte] = {
      if (n < 0 || n > b.length.toLong - pos) fail(pos, s"$n payload bytes truncated")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    def readString(): String = new String(readBytes(readVarLong()), UTF_8)
    def atEnd: Boolean = pos >= b.length
  }

  /** One decoded Doc record. */
  final case class Doc(id: Long, text: String, lang: String)

  def writeDoc(out: java.io.ByteArrayOutputStream, d: Doc): Unit = {
    writeVarLong(out, d.id)
    val t = d.text.getBytes(UTF_8)
    writeVarLong(out, t.length.toLong); out.write(t, 0, t.length)
    val l = d.lang.getBytes(UTF_8)
    writeVarLong(out, l.length.toLong); out.write(l, 0, l.length)
  }

  def readDoc(r: Reader): Doc =
    Doc(r.readVarLong(), r.readString(), r.readString())

  // ---- union / array primitives (nullable Kafka envelopes ride these) ----------

  /** Avro union ["null","string"]: a varint branch index then the value —
    * how a Kafka tombstone (`value IS NULL`) is actually encoded.
    */
  def writeOptString(out: java.io.ByteArrayOutputStream, s: String): Unit =
    if (s == null) writeVarLong(out, 0L)
    else { writeVarLong(out, 1L); val b = s.getBytes(UTF_8)
      writeVarLong(out, b.length.toLong); out.write(b, 0, b.length) }

  def readOptString(r: Reader): String = r.readVarLong() match {
    case 0 => null
    case 1 => r.readString()
    case i => r.fail(r.pos, s"union branch $i out of range for [null,string]")
  }

  /** Avro array encoding: the same signed block-count framing the file
    * metadata map uses (negative count carries a byte size; 0 ends).
    */
  def writeArray[T](out: java.io.ByteArrayOutputStream, items: Seq[T])(
      one: (java.io.ByteArrayOutputStream, T) => Unit): Unit = {
    if (items.nonEmpty) {
      writeVarLong(out, items.size.toLong)
      items.foreach(one(out, _))
    }
    writeVarLong(out, 0L)
  }

  def readArray[T](r: Reader)(one: Reader => T): Vector[T] = {
    val items = Vector.newBuilder[T]
    var count = r.readVarLong()
    while (count != 0) {
      val n = if (count < 0) { r.readVarLong(); -count } else count
      var i = 0L
      while (i < n) { items += one(r); i += 1 }
      count = r.readVarLong()
    }
    items.result()
  }

  // ---- Confluent Schema-Registry wire envelope ---------------------------------

  /** magic 0x00 | int32 BE schema id | avro binary — what a production
    * Kafka topic actually carries per message.
    */
  def encodeEnvelope(schemaId: Int, d: Doc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
    out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
    writeDoc(out, d)
    out.toByteArray
  }

  def decodeEnvelope(docId: Long, b: Array[Byte]): (Int, Doc) = {
    val r = new Reader(docId, b, 0)
    if (b.length < 5) r.fail(0, "truncated envelope header")
    if (b(0) != 0) r.fail(0, s"bad envelope magic ${b(0)}")
    val id = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    r.pos = 5
    val doc = readDoc(r)
    if (!r.atEnd) r.fail(r.pos, "trailing bytes after the record")
    (id, doc)
  }

  // ---- OCF container walk --------------------------------------------------------

  /** One parsed container: schema JSON, codec, records in order, and the
    * per-block (record count, payload byte offset) census.
    */
  final case class Container[T](schema: String, codec: String, docs: Vector[T],
      blocks: Vector[(Long, Long)])

  /** Walk an OCF with the [[Doc]] record schema. */
  def parseOcf(docId: Long, b: Array[Byte]): Container[Doc] =
    parseOcfWith(docId, b)(readDoc)

  /** Walk an OCF whose records decode through `read` — the same
    * container skeleton serves any record schema (the envelope fixture
    * twin rides this with the union/array readers).
    */
  def parseOcfWith[T](docId: Long, b: Array[Byte])(read: Reader => T): Container[T] =
    parseOcfBy(docId, b)(_ => read)

  /** Walk an OCF whose record reader is BUILT FROM the container's
    * embedded writer schema (`mk` receives the `avro.schema` JSON before
    * the first block) — the hook schema RESOLUTION rides: the reader
    * shape is fixed, the writer shape arrives with the file.
    */
  def parseOcfBy[T](docId: Long, b: Array[Byte])(
      mk: String => Reader => T): Container[T] = {
    val r = new Reader(docId, b, 0)
    if (b.length < 4 || b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1)
      r.fail(0, "bad OCF magic")
    r.pos = 4
    // file metadata: avro map<string, bytes>
    val meta = Map.newBuilder[String, Array[Byte]]
    var count = r.readVarLong()
    while (count != 0) {
      val items = if (count < 0) { r.readVarLong(); -count } else count
      var i = 0L
      while (i < items) {
        val k = r.readString()
        meta += k -> r.readBytes(r.readVarLong())
        i += 1
      }
      count = r.readVarLong()
    }
    val m = meta.result()
    val schema = m.get("avro.schema").map(new String(_, UTF_8))
      .getOrElse(r.fail(r.pos, "missing avro.schema metadata"))
    val codec = m.get("avro.codec").map(new String(_, UTF_8)).getOrElse("null")
    if (codec != "null" && codec != "deflate")
      r.fail(r.pos, s"unsupported avro.codec '$codec'")
    val read = mk(schema)
    val sync = r.readBytes(16)
    val docs = Vector.newBuilder[T]
    val blocks = Vector.newBuilder[(Long, Long)]
    while (!r.atEnd) {
      val nRecs = r.readVarLong()
      if (nRecs <= 0) r.fail(r.pos, s"non-positive block record count $nRecs")
      val size = r.readVarLong()
      val at = r.pos
      val payload0 = r.readBytes(size)
      val payload = if (codec == "deflate") inflateRaw(docId, at, payload0)
        else payload0
      val blockSync = r.readBytes(16)
      if (!java.util.Arrays.equals(blockSync, sync))
        r.fail(r.pos - 16, "block sync marker mismatch")
      val br = new Reader(docId, payload, 0)
      var i = 0L
      while (i < nRecs) { docs += read(br); i += 1 }
      if (!br.atEnd) br.fail(br.pos, "trailing bytes inside a block")
      blocks += ((nRecs, at.toLong))
    }
    Container(schema, codec, docs.result(), blocks.result())
  }

  private def inflateRaw(docId: Long, at: Int, b: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true) // OCF deflate is raw (no zlib wrapper)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val chunk = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(chunk)
          catch { case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"doc $docId: avro parse at byte $at: deflate block corrupt: ${e.getMessage}")
          }
        if (n == 0 && !inf.finished()) throw new IllegalArgumentException(
          s"doc $docId: avro parse at byte $at: deflate block truncated")
        out.write(chunk, 0, n)
      }
      if (inf.getRemaining > 0) throw new IllegalArgumentException(
        s"doc $docId: avro parse at byte $at: ${inf.getRemaining} bytes trail the deflate stream inside the block")
      out.toByteArray
    } finally inf.end()
  }

  // ---- q_avro_decode: the Confluent wire envelope -------------------------------

  private val SchemaId = 7

  /** The full zigzag-varint byte-width ladder for a NON-NEGATIVE value
    * (zigzag doubles it, then 7 bits ride per byte) — scale-independent:
    * correct for any doc_id / string length a bigger SF produces, not
    * just the widths the small fixtures happen to exercise.
    */
  private def sqlVarLen(col: String): String =
    s"""CASE WHEN $col < 64 THEN 1 WHEN $col < 8192 THEN 2
       | WHEN $col < 1048576 THEN 3 WHEN $col < 134217728 THEN 4
       | WHEN $col < 17179869184 THEN 5 WHEN $col < 2199023255552 THEN 6
       | WHEN $col < 281474976710656 THEN 7
       | WHEN $col < 36028797018963968 THEN 8
       | WHEN $col < 4611686018427387904 THEN 9 ELSE 10 END""".stripMargin
      .replace("\n", "")

  /** Per-document Confluent envelopes encoded AND decoded by the
    * hand-rolled codec; the oracle recomputes the decoded fields and the
    * exact envelope byte length — 5 header bytes plus the zigzag-varint
    * arithmetic — closed-form from the documents table.
    */
  val q_avro_decode: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, text, lang,
       |    octet_length(encode(text)) AS plen,
       |    octet_length(encode(lang)) AS clen
       |  FROM documents)
       |SELECT doc_id, CAST($SchemaId AS INT) AS schema_id,
       |  md5(text) AS text_md5, lang,
       |  CAST(5
       |    + ${sqlVarLen("doc_id")}
       |    + ${sqlVarLen("plen")} + plen
       |    + ${sqlVarLen("clen")} + clen
       |    AS BIGINT) AS envelope_bytes
       |FROM d
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text, lang) =>
          val env = encodeEnvelope(SchemaId, Doc(id, text, lang))
          val (sid, doc) = decodeEnvelope(id, env)
          md.reset()
          val hex = md.digest(doc.text.getBytes(UTF_8)).map("%02x".format(_)).mkString
          (doc.id, sid, hex, doc.lang, env.length.toLong)
        }
      }
      .toDF("doc_id", "schema_id", "text_md5", "lang", "envelope_bytes")
      .orderBy(col("doc_id"))
  }

  // ---- q_avro_ocf: the container written by the REAL library --------------------

  private val PerFile = 8

  /** 8-document containers written by the REAL Avro library (deflate
    * codec) and read back ENTIRELY by the hand-rolled walk — metadata
    * map, sync framing, raw-deflate blocks, record decode. The oracle
    * recomputes every gated field closed-form; block geometry is
    * encoder-dependent and spec-bounded instead (AvroSpec).
    */
  val q_avro_ocf: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerFile AS ocf, text, lang
       |  FROM documents)
       |SELECT doc_id, CAST(ocf AS BIGINT) AS ocf_file,
       |  CAST(count(*) OVER (PARTITION BY ocf) AS BIGINT) AS n_records,
       |  'deflate' AS codec,
       |  md5(text) AS text_md5, lang
       |FROM d
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      .groupBy(expr(s"doc_id div $PerFile").as("ocf"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2"), col("lang").as("_3")))).as("docs"))
      .as[(Long, Seq[(Long, String, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (ocf, docs) =>
          val bytes = AvroCodec.writeOcfViaLibrary(
            docs.map { case (id, t, l) => Doc(id, t, l) })
          val c = parseOcf(ocf, bytes)
          if (c.docs.size != docs.size) throw new IllegalStateException(
            s"ocf $ocf: ${docs.size} records in, ${c.docs.size} out")
          if (c.blocks.map(_._1).sum != docs.size) throw new IllegalStateException(
            s"ocf $ocf: block census ${c.blocks} != ${docs.size} records")
          c.docs.map { doc =>
            md.reset()
            val hex = md.digest(doc.text.getBytes(UTF_8)).map("%02x".format(_)).mkString
            (doc.id, ocf, c.docs.size.toLong, c.codec, hex, doc.lang)
          }
        }
      }
      .toDF("doc_id", "ocf_file", "n_records", "codec", "text_md5", "lang")
      .orderBy(col("doc_id"))
  }

  /** Encode through the REAL Avro library (GenericDatumWriter +
    * DataFileWriter, deflate) — the independent half our walk is gated
    * against in the driver path.
    */
  def writeOcfViaLibrary(docs: Seq[Doc]): Array[Byte] = {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new ASchema.Parser().parse(SchemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, out)
    docs.foreach { d =>
      val rec = new GenericData.Record(schema)
      rec.put("id", java.lang.Long.valueOf(d.id))
      rec.put("text", d.text)
      rec.put("lang", d.lang)
      w.append(rec)
    }
    w.close()
    out.toByteArray
  }

  val all: Map[String, QueryDef] = Map(
    "q_avro_decode" -> q_avro_decode,
    "q_avro_ocf" -> q_avro_ocf)
}
