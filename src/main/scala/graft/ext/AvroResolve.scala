package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.avro.Schema
import org.apache.avro.Schema.Type
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Avro SCHEMA RESOLUTION (public Avro 1.x spec, §"Schema Resolution")
  * over the hand-rolled binary walk — the half of the wire format H78
  * left open: real Confluent topics and at-rest corpora EVOLVE, so a
  * reader's schema routinely differs from the writer schema embedded in
  * each container. The rules implemented here are the spec's, applied
  * while decoding [[AvroCodec.Reader]] bytes written as `writer` into
  * the shape of `reader`:
  *
  *   - record fields matched BY NAME: writer fields are decoded in
  *     writer order into reader slots; writer-only fields are SKIPPED
  *     (type-driven, no decode of the payload where the framing allows);
  *     reader-only fields take their schema DEFAULT, and a missing
  *     default fails loudly (the spec's error case)
  *   - numeric promotions: int→long/float/double, long→float/double,
  *     float→double; string↔bytes
  *   - writer union: the branch index picks the written branch, which
  *     then resolves against the reader schema; reader union vs a
  *     non-union writer: a reader branch with the writer's EXACT type is
  *     preferred, then the first promotable branch (the real resolving
  *     reader's rule), else a loud error
  *   - arrays resolve item-wise under the block framing (a negative
  *     block count's byte size lets writer-only array fields skip
  *     without decoding items)
  *
  * Out of scope (each fails loudly, never silently mis-decodes): enum,
  * fixed, map resolution and schema aliases — none appear in the
  * engine's interchange surface.
  *
  * Cross-validated in AvroSpec against the REAL library's RESOLVING
  * reader (`GenericDatumReader(writer, reader)`) over add-with-default /
  * promote / reorder / skip / union legs — spec compliance, not
  * self-consistency.
  */
object AvroResolve {
  import AvroCodec.Reader

  private def le(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < b.length) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    v
  }
  private def readFloat(r: Reader): Float =
    java.lang.Float.intBitsToFloat(le(r.readBytes(4)).toInt)
  private def readDouble(r: Reader): Double =
    java.lang.Double.longBitsToDouble(le(r.readBytes(8)))

  /** Can bytes written as `writer` resolve into `reader`? (the spec's
    * "match" relation, restricted to the supported subset).
    */
  def canResolve(writer: Schema, reader: Schema): Boolean =
    (writer.getType, reader.getType) match {
      case (Type.UNION, _) =>
        true // the written branch is checked when its index is read
      case (_, Type.UNION) =>
        reader.getTypes.asScala.exists(b => canResolve(writer, b))
      case (w, r) if w == r =>
        w match {
          case Type.RECORD => writer.getFullName == reader.getFullName
          case Type.ARRAY => canResolve(writer.getElementType, reader.getElementType)
          case _ => true
        }
      case (Type.INT, Type.LONG | Type.FLOAT | Type.DOUBLE) => true
      case (Type.LONG, Type.FLOAT | Type.DOUBLE) => true
      case (Type.FLOAT, Type.DOUBLE) => true
      case (Type.STRING, Type.BYTES) => true
      case (Type.BYTES, Type.STRING) => true
      case _ => false
    }

  private implicit class JList[T](l: java.util.List[T]) {
    def asScala: Vector[T] = {
      val b = Vector.newBuilder[T]
      l.forEach(t => b += t)
      b.result()
    }
  }

  /** Decode one value written as `writer`, shaped as `reader`. Records
    * come back as `Vector[Any]` in READER field order, strings as
    * `String`, bytes as `Array[Byte]`, numbers in the reader's width.
    */
  def read(r: Reader, writer: Schema, reader: Schema): Any =
    (writer.getType, reader.getType) match {
      case (Type.UNION, _) =>
        val branch = r.readVarLong()
        val types = writer.getTypes
        if (branch < 0 || branch >= types.size)
          r.fail(r.pos, s"union branch $branch out of range for ${types.size}")
        read(r, types.get(branch.toInt), reader)
      case (_, Type.UNION) =>
        // Two-pass branch selection, matching the real resolving reader
        // (GenericDatumReader/Resolver): prefer a reader branch with the
        // writer's EXACT type (full-name match for records) and only then
        // fall back to a promotable branch — otherwise writer long vs
        // reader ["float","long"] would silently decode a lossy float
        // (ADVICE r12).
        val branches = reader.getTypes.asScala
        val exact = branches.find(b =>
          b.getType == writer.getType && canResolve(writer, b))
        exact.orElse(branches.find(canResolve(writer, _))) match {
          case Some(b) => read(r, writer, b)
          case None => r.fail(r.pos,
            s"no reader union branch accepts writer ${writer.getType}")
        }
      case (Type.NULL, Type.NULL) => null
      case (Type.BOOLEAN, Type.BOOLEAN) => le(r.readBytes(1)) != 0
      case (Type.INT, Type.INT) => r.readVarLong().toInt
      case (Type.INT | Type.LONG, Type.LONG) => r.readVarLong()
      case (Type.INT | Type.LONG, Type.FLOAT) => r.readVarLong().toFloat
      case (Type.INT | Type.LONG, Type.DOUBLE) => r.readVarLong().toDouble
      case (Type.FLOAT, Type.FLOAT) => readFloat(r)
      case (Type.FLOAT, Type.DOUBLE) => readFloat(r).toDouble
      case (Type.DOUBLE, Type.DOUBLE) => readDouble(r)
      case (Type.STRING, Type.STRING) => r.readString()
      case (Type.STRING, Type.BYTES) => r.readBytes(r.readVarLong())
      case (Type.BYTES, Type.STRING) =>
        new String(r.readBytes(r.readVarLong()), UTF_8)
      case (Type.BYTES, Type.BYTES) => r.readBytes(r.readVarLong())
      case (Type.ARRAY, Type.ARRAY) =>
        AvroCodec.readArray(r)(read(_, writer.getElementType, reader.getElementType))
      case (Type.RECORD, Type.RECORD) =>
        if (writer.getFullName != reader.getFullName) r.fail(r.pos,
          s"record name mismatch: wrote ${writer.getFullName}, reading ${reader.getFullName}")
        val rFields = reader.getFields
        val out = new Array[Any](rFields.size)
        val seen = new Array[Boolean](rFields.size)
        writer.getFields.forEach { wf =>
          val rf = reader.getField(wf.name)
          if (rf == null) skip(r, wf.schema)
          else { out(rf.pos) = read(r, wf.schema, rf.schema); seen(rf.pos) = true }
        }
        rFields.forEach { rf =>
          if (!seen(rf.pos)) {
            if (!rf.hasDefaultValue) r.fail(r.pos,
              s"reader field '${rf.name}' absent from writer schema and has no default")
            out(rf.pos) = defaultValue(rf.name, rf.schema, rf.defaultVal())
          }
        }
        out.toVector
      case (w, rd) => r.fail(r.pos, s"unsupported schema resolution $w -> $rd")
    }

  /** Skip one value of `writer`'s shape without materializing it. */
  def skip(r: Reader, writer: Schema): Unit = writer.getType match {
    case Type.NULL => ()
    case Type.BOOLEAN => r.readBytes(1): Unit
    case Type.INT | Type.LONG => r.readVarLong(): Unit
    case Type.FLOAT => r.readBytes(4): Unit
    case Type.DOUBLE => r.readBytes(8): Unit
    case Type.STRING | Type.BYTES => r.readBytes(r.readVarLong()): Unit
    case Type.RECORD => writer.getFields.forEach(f => skip(r, f.schema))
    case Type.UNION =>
      val branch = r.readVarLong()
      val types = writer.getTypes
      if (branch < 0 || branch >= types.size)
        r.fail(r.pos, s"union branch $branch out of range for ${types.size}")
      skip(r, types.get(branch.toInt))
    case Type.ARRAY =>
      var count = r.readVarLong()
      while (count != 0) {
        if (count < 0) r.readBytes(r.readVarLong()): Unit // block byte size: fast skip
        else { var i = 0L; while (i < count) { skip(r, writer.getElementType); i += 1 } }
        count = r.readVarLong()
      }
    case t => r.fail(r.pos, s"unsupported skip of schema type $t")
  }

  /** A reader-only field's schema default, converted from the parsed
    * JSON default object (the spec: a union's default is of its FIRST
    * branch). Unsupported shapes fail loudly.
    */
  def defaultValue(name: String, schema: Schema, v: AnyRef): Any = {
    val target = if (schema.getType == Type.UNION) schema.getTypes.get(0) else schema
    (target.getType, v) match {
      case (Type.NULL, _) => null
      case (Type.STRING, s: CharSequence) => s.toString
      case (Type.BOOLEAN, b: java.lang.Boolean) => b.booleanValue()
      case (Type.INT, n: java.lang.Number) => n.intValue()
      case (Type.LONG, n: java.lang.Number) => n.longValue()
      case (Type.FLOAT, n: java.lang.Number) => n.floatValue()
      case (Type.DOUBLE, n: java.lang.Number) => n.doubleValue()
      case (t, d) => throw new IllegalArgumentException(
        s"field '$name': unsupported default of type $t (json: $d)")
    }
  }

  /** Parse an OCF and resolve every record from the container's EMBEDDED
    * writer schema into `readerJson`'s shape — the production read of an
    * evolved at-rest corpus.
    */
  def parseOcfResolving(docId: Long, b: Array[Byte],
      readerJson: String): AvroCodec.Container[Vector[Any]] = {
    val reader = new Schema.Parser().parse(readerJson)
    AvroCodec.parseOcfBy(docId, b) { writerJson =>
      val writer = new Schema.Parser().parse(writerJson)
      r => read(r, writer, reader).asInstanceOf[Vector[Any]]
    }
  }

  // ---- q_avro_evolve: a mixed-schema-version corpus ------------------------------

  private val PerFile = 8

  /** V1 writer: no `lang`, `views` is an INT, fields in one order. */
  val WriterV1: String =
    """{"type":"record","name":"EvolvedDoc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"text","type":"string"},
      |{"name":"views","type":"int"}]}""".stripMargin.replace("\n", "")

  /** V2 writer: REORDERED, adds `lang` and a field the reader never
    * adopted (`extra_tag` — must be skipped).
    */
  val WriterV2: String =
    """{"type":"record","name":"EvolvedDoc","fields":[
      |{"name":"lang","type":"string"},
      |{"name":"text","type":"string"},
      |{"name":"extra_tag","type":"string"},
      |{"name":"id","type":"long"},
      |{"name":"views","type":"long"}]}""".stripMargin.replace("\n", "")

  /** The reader: `views` promoted to LONG, `lang` defaulted for v1
    * files, a never-written `score` defaulted everywhere, its own field
    * order.
    */
  val ReaderV3: String =
    """{"type":"record","name":"EvolvedDoc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"text","type":"string"},
      |{"name":"lang","type":"string","default":"und"},
      |{"name":"views","type":"long"},
      |{"name":"score","type":"double","default":1.5}]}""".stripMargin
      .replace("\n", "")

  /** Write one OCF under a writer schema version via the REAL library. */
  def writeEvolvedOcf(version: Int,
      docs: Seq[(Long, String, String)]): Array[Byte] = {
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(if (version == 1) WriterV1 else WriterV2)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, out)
    docs.foreach { case (id, text, lang) =>
      val rec = new GenericData.Record(schema)
      rec.put("id", java.lang.Long.valueOf(id))
      rec.put("text", text)
      if (version == 1) rec.put("views", java.lang.Integer.valueOf((id % 1000L).toInt))
      else {
        rec.put("views", java.lang.Long.valueOf(id % 1000L))
        rec.put("lang", lang)
        rec.put("extra_tag", s"tag-$id")
      }
      w.append(rec)
    }
    w.close()
    out.toByteArray
  }

  /** Mixed-version corpus: even containers written under v1, odd under
    * v2 (both by the REAL library), every one decoded by OUR resolving
    * walk under the SINGLE v3 reader schema — defaults, promotion,
    * reorder and writer-only skip all land in one oracle-gated frame.
    */
  val q_avro_evolve: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerFile AS ocf, text, lang
       |  FROM documents)
       |SELECT doc_id, CAST(ocf AS BIGINT) AS ocf_file,
       |  CAST(ocf % 2 + 1 AS INT) AS writer_version,
       |  CASE WHEN ocf % 2 = 0 THEN 'und' ELSE lang END AS lang,
       |  CAST(doc_id % 1000 AS BIGINT) AS views,
       |  CAST(1.5 AS DOUBLE) AS score,
       |  md5(text) AS text_md5
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
          val version = (ocf % 2 + 1).toInt
          val bytes = writeEvolvedOcf(version, docs)
          val c = parseOcfResolving(ocf, bytes, ReaderV3)
          if (c.docs.size != docs.size) throw new IllegalStateException(
            s"ocf $ocf: ${docs.size} records in, ${c.docs.size} out")
          c.docs.map { rec =>
            // reader field order: id, text, lang, views, score
            val id = rec(0).asInstanceOf[Long]
            val text = rec(1).asInstanceOf[String]
            md.reset()
            val hex = md.digest(text.getBytes(UTF_8)).map("%02x".format(_)).mkString
            (id, ocf, version, rec(2).asInstanceOf[String],
              rec(3).asInstanceOf[Long], rec(4).asInstanceOf[Double], hex)
          }
        }
      }
      .toDF("doc_id", "ocf_file", "writer_version", "lang", "views", "score",
        "text_md5")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_avro_evolve" -> q_avro_evolve)
}
