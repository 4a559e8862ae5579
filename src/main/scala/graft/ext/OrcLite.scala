package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** ORC PostScript / Footer metadata walk — the OTHER columnar format a
  * production lake serves (Spark ships an ORC writer next to parquet),
  * and the composition the H80 protobuf walk was built for: ORC's
  * footer is PROTOBUF where parquet's is thrift, so the same
  * hand-rolled varint/zigzag/length-delimited field machinery
  * (graft.ext.Proto) walks it — extended here into a GENERIC message
  * walk (every field of every message parsed or skipped by wire type,
  * so footers from any writer version survive: new statistics kinds,
  * encryption fields, calendar metadata all pass through as unknowns).
  *
  * Layers, all public spec:
  *  - file framing: 3-byte `ORC` magic at the start, one PostScript
  *    LENGTH byte at the very END of the file, the PostScript
  *    immediately before it (never compressed), the Footer before
  *    that, sized by the PostScript's `footerLength`;
  *  - PostScript: footer/metadata lengths, compression kind + block
  *    size, writer version list, and its own `ORC` magic (field 8000);
  *  - ORC compressed-stream framing over the Footer: repeated chunks
  *    of [3-byte LE header = (chunkLen << 1) | isOriginal][chunk],
  *    ZLIB meaning RAW DEFLATE (JDK `Inflater(nowrap)` — a JDK
  *    primitive, not a codec library), SNAPPY through the hand-rolled
  *    raw-block decoder (ParquetRead.snappyUncompress), ZSTD through
  *    the zstd-jni copy Spark itself ships;
  *  - Footer: stripe directory (offset / index / data / footer
  *    lengths, per-stripe row counts), the type TREE (kind enum +
  *    subtype ids + field names, re-assembled depth-first like the
  *    parquet schema walk), file row count, and per-column statistics
  *    (value counts, zigzag sint64 int min/max/SUM, string min/max,
  *    hasNull) — the inputs of ORC's stripe/file pruning decision.
  *
  * Structural damage fails LOUDLY with the byte offset: short files,
  * bad magic at either end, a PostScript length crossing the file
  * start, footer lengths crossing the PostScript, chunk headers
  * crossing the region, truncated varints, unterminated nested
  * messages, unknown compression kinds, type-tree child ids out of
  * range.
  *
  * Cross-validated in OrcSpec against the REAL orc-core (the reader
  * Spark itself uses): files written by `spark.write.orc` under zlib /
  * snappy / zstd / none parse field-for-field equal to
  * `OrcFile.createReader` (row count, compression kind + block size,
  * schema string, stripe census, int + string statistics), and the
  * loud-failure table. The query's writer is the real orc-core
  * `OrcFile.createWriter` — the component under test is the walk.
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode/parse pass, zero post-parse shuffles; the walk reads ONLY
  * the PostScript + Footer bytes — never a stripe — the planner-side
  * I/O profile at any corpus size.
  */
object OrcLite {

  // ---- generic protobuf message walk (on the H80 primitives) -----------------------

  sealed trait PVal
  final case class PVarint(v: Long) extends PVal
  final case class PFix64(v: Long) extends PVal
  final case class PFix32(v: Long) extends PVal
  final case class PBytes(v: Array[Byte]) extends PVal

  /** One decoded message: every field in arrival order (protobuf fields
    * repeat; last-one-wins for scalars, all-kept for repeated).
    */
  final case class PMsg(ctx: String, fields: Map[Int, Vector[PVal]]) {
    private def one(id: Int): Option[PVal] = fields.get(id).map(_.last)
    def varint(id: Int): Option[Long] = one(id).map {
      case PVarint(v) => v
      case other => throw new IllegalArgumentException(
        s"$ctx: field $id: expected a varint, got ${other.getClass.getSimpleName}")
    }
    def sint(id: Int): Option[Long] = varint(id).map(Proto.unzigzag)
    def bytesF(id: Int): Option[Array[Byte]] = one(id).map {
      case PBytes(v) => v
      case other => throw new IllegalArgumentException(
        s"$ctx: field $id: expected bytes, got ${other.getClass.getSimpleName}")
    }
    def str(id: Int): Option[String] = bytesF(id).map(new String(_, UTF_8))
    def msg(id: Int): Option[PMsg] = bytesF(id).map(b => walkMessage(s"$ctx/$id", b, 0, b.length))
    def msgs(id: Int): Vector[PMsg] = fields.getOrElse(id, Vector.empty).map {
      case PBytes(v) => walkMessage(s"$ctx/$id", v, 0, v.length)
      case other => throw new IllegalArgumentException(
        s"$ctx: field $id: expected a nested message, got ${other.getClass.getSimpleName}")
    }
    def strs(id: Int): Vector[String] = fields.getOrElse(id, Vector.empty).map {
      case PBytes(v) => new String(v, UTF_8)
      case other => throw new IllegalArgumentException(
        s"$ctx: field $id: expected strings, got ${other.getClass.getSimpleName}")
    }
    /** Repeated uint32/uint64 under the packed/unpacked concatenation
      * rule: varint occurrences append one value, length-delimited
      * occurrences append a packed run.
      */
    def uints(id: Int): Vector[Long] = fields.getOrElse(id, Vector.empty).flatMap {
      case PVarint(v) => Vector(v)
      case PBytes(b) =>
        val r = new Proto.Reader(0L, b, 0, b.length)
        val out = Vector.newBuilder[Long]
        while (!r.atEnd) out += r.readVarint()
        out.result()
      case other => throw new IllegalArgumentException(
        s"$ctx: field $id: expected packed/repeated uints, got ${other.getClass.getSimpleName}")
    }
  }

  /** Walk one protobuf message generically: every field keyed and kept
    * by wire type; groups are skipped with balanced nesting (the H80
    * unknown-field rule). Nested messages stay as bytes until a
    * projection asks for them — the walk cannot know which
    * length-delimited fields are messages vs strings.
    */
  def walkMessage(ctx: String, b: Array[Byte], from: Int, end: Int): PMsg = {
    val r = new Proto.Reader(0L, b, from, end)
    val fields = scala.collection.mutable.Map.empty[Int, Vector[PVal]]
    def add(id: Int, v: PVal): Unit = fields.update(id, fields.getOrElse(id, Vector.empty) :+ v)
    while (!r.atEnd) {
      val key = r.readVarint()
      val id = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (id <= 0) r.fail(r.pos, s"$ctx: field id $id not positive")
      wire match {
        case 0 => add(id, PVarint(r.readVarint()))
        case 1 => add(id, PFix64(r.readFixed(8)))
        case 5 => add(id, PFix32(r.readFixed(4)))
        case 2 =>
          val (f, l) = r.readLenDelimited()
          add(id, PBytes(r.slice(f, l)))
        case 3 | 4 => r.skip(id, wire) // groups: legal, unknown, skipped
        case w => r.fail(r.pos, s"$ctx: reserved wire type $w on field $id")
      }
    }
    PMsg(ctx, fields.toMap)
  }

  // ---- ORC compressed-stream framing -----------------------------------------------

  private val CompressionNames = Vector("NONE", "ZLIB", "SNAPPY", "LZO", "LZ4", "ZSTD")
  def compressionName(ctx: String, k: Int): String =
    if (k >= 0 && k < CompressionNames.size) CompressionNames(k)
    else throw new IllegalArgumentException(s"$ctx: unknown ORC compression kind $k")

  private def inflateRaw(ctx: String, b: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // ORC ZLIB is raw DEFLATE
    try {
      inf.setInput(b, from, len)
      val out = new java.io.ByteArrayOutputStream(len * 3 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new IllegalArgumentException(
          s"$ctx: DEFLATE chunk at byte $from truncated")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException => throw new IllegalArgumentException(
        s"$ctx: DEFLATE chunk at byte $from: ${e.getMessage}")
    } finally inf.end()
  }

  /** Undo ORC's chunked stream compression over `b[from, end)`: repeated
    * [3-byte LE header = (len << 1) | isOriginal][len chunk bytes].
    */
  def orcDecompress(ctx: String, b: Array[Byte], from: Int, end: Int,
      kind: String): Array[Byte] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: ORC stream at byte $off: $why")
    if (kind == "NONE") return java.util.Arrays.copyOfRange(b, from, end)
    val out = new java.io.ByteArrayOutputStream((end - from) * 3 + 64)
    var pos = from
    while (pos < end) {
      if (pos + 3 > end) fail(pos, "chunk header truncated")
      var h = 0
      var i = 0
      while (i < 3) { h |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
      val isOriginal = (h & 1) == 1
      val len = h >>> 1
      if (pos + 3 + len > end) fail(pos, s"chunk of $len crosses the stream end")
      if (isOriginal) out.write(b, pos + 3, len)
      else kind match {
        case "ZLIB" => val d = inflateRaw(ctx, b, pos + 3, len); out.write(d, 0, d.length)
        case "SNAPPY" =>
          val d = ParquetRead.snappyUncompress(ctx,
            java.util.Arrays.copyOfRange(b, pos + 3, pos + 3 + len))
          out.write(d, 0, d.length)
        case "ZSTD" =>
          // the zstd-jni copy Spark itself ships (stream mode: ORC's
          // zstd chunks may omit the frame content size); frame framing
          // is checked by our own walk elsewhere (ZstdCodec.parseZstd)
          val src = java.util.Arrays.copyOfRange(b, pos + 3, pos + 3 + len)
          val zs = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(src))
          try {
            val buf = new Array[Byte](8192)
            var r = zs.read(buf)
            while (r >= 0) { out.write(buf, 0, r); r = zs.read(buf) }
          } catch {
            case e: java.io.IOException =>
              fail(pos, s"zstd chunk: ${e.getMessage}")
          } finally zs.close()
        case other => fail(pos, s"compression kind $other has no decode path here")
      }
      pos += 3 + len
    }
    out.toByteArray
  }

  // ---- the footer model ---------------------------------------------------------------

  final case class StripeInfo(offset: Long, indexLength: Long, dataLength: Long,
      footerLength: Long, numberOfRows: Long)
  final case class OrcType(kind: String, subtypes: Vector[Int], fieldNames: Vector[String],
      maxLength: Option[Long], precision: Option[Long], scale: Option[Long])
  final case class IntStats(min: Option[Long], max: Option[Long], sum: Option[Long])
  final case class StrStats(min: Option[String], max: Option[String], sum: Option[Long])
  final case class ColStats(numberOfValues: Option[Long], hasNull: Option[Boolean],
      ints: Option[IntStats], strs: Option[StrStats])
  final case class OrcMeta(compression: String, compressionBlockSize: Option[Long],
      versionList: Vector[Long], writerVersion: Option[Long],
      footerLength: Long, metadataLength: Long,
      numberOfRows: Long, headerLength: Option[Long], contentLength: Option[Long],
      rowIndexStride: Option[Long], stripes: Vector[StripeInfo],
      types: Vector[OrcType], stats: Vector[ColStats])

  private val TypeKinds = Vector("BOOLEAN", "BYTE", "SHORT", "INT", "LONG", "FLOAT",
    "DOUBLE", "STRING", "BINARY", "TIMESTAMP", "LIST", "MAP", "STRUCT", "UNION",
    "DECIMAL", "DATE", "VARCHAR", "CHAR", "TIMESTAMP_INSTANT")
  def typeKind(ctx: String, k: Int): String =
    if (k >= 0 && k < TypeKinds.size) TypeKinds(k)
    else throw new IllegalArgumentException(s"$ctx: unknown ORC type kind $k")

  private val Magic = "ORC".getBytes(UTF_8)

  /** Parse the PostScript + Footer of a complete ORC file. Reads ONLY
    * the tail region.
    */
  def parseFooter(ctx: String, b: Array[Byte]): OrcMeta = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: ORC parse at byte $off: $why")
    val n = b.length
    if (n < 16) fail(0, s"file shorter than the 16-byte minimum ($n)")
    if (b(0) != 'O' || b(1) != 'R' || b(2) != 'C') fail(0, "bad leading magic (want ORC)")
    val psLen = b(n - 1) & 0xff
    if (psLen < 1 || n - 1 - psLen < 3) fail(n - 1L,
      s"PostScript length $psLen crosses the file start")
    val psStart = n - 1 - psLen
    val ps = walkMessage(s"$ctx/PostScript", b, psStart, n - 1)
    val psMagic = ps.str(8000).getOrElse(fail(psStart, "PostScript missing its magic"))
    if (psMagic != "ORC") fail(psStart, s"PostScript magic '$psMagic' (want ORC)")
    val footerLen = ps.varint(1).getOrElse(fail(psStart, "PostScript missing footerLength"))
    val compression = compressionName(ctx, ps.varint(2).getOrElse(0L).toInt)
    val metadataLen = ps.varint(5).getOrElse(0L)
    val footerStart = psStart - footerLen
    if (footerLen < 1 || footerStart - metadataLen < 3) fail(psStart,
      s"footer length $footerLen + metadata $metadataLen cross the file start")

    val fb = orcDecompress(ctx, b, footerStart.toInt, psStart, compression)
    val f = walkMessage(s"$ctx/Footer", fb, 0, fb.length)
    val stripes = f.msgs(3).map { s =>
      StripeInfo(s.varint(1).getOrElse(fail(footerStart, "stripe missing offset")),
        s.varint(2).getOrElse(0L), s.varint(3).getOrElse(0L),
        s.varint(4).getOrElse(fail(footerStart, "stripe missing footerLength")),
        s.varint(5).getOrElse(fail(footerStart, "stripe missing numberOfRows")))
    }
    val types = f.msgs(4).map { t =>
      OrcType(typeKind(ctx, t.varint(1).getOrElse(fail(footerStart, "type missing kind")).toInt),
        t.uints(2).map(_.toInt), t.strs(3), t.varint(4), t.varint(5), t.varint(6))
    }
    types.zipWithIndex.foreach { case (t, i) =>
      t.subtypes.foreach { s =>
        if (s <= i || s >= types.size) fail(footerStart,
          s"type $i child id $s out of range (types: ${types.size})")
      }
    }
    val stats = f.msgs(7).map { s =>
      ColStats(s.varint(1), s.varint(10).map(_ != 0L),
        s.msg(2).map(m => IntStats(m.sint(1), m.sint(2), m.sint(3))),
        s.msg(4).map(m => StrStats(m.str(1), m.str(2), m.sint(3))))
    }
    val rows = f.varint(6).getOrElse(fail(footerStart, "Footer missing numberOfRows"))
    val stripeRows = stripes.map(_.numberOfRows).sum
    if (stripes.nonEmpty && stripeRows != rows) fail(footerStart,
      s"stripe rows $stripeRows != footer numberOfRows $rows")
    OrcMeta(compression, ps.varint(3), ps.uints(4), ps.varint(6),
      footerLen, metadataLen, rows, f.varint(1), f.varint(2), f.varint(8),
      stripes, types, stats)
  }

  private val HiveNames = Map("BOOLEAN" -> "boolean", "BYTE" -> "tinyint",
    "SHORT" -> "smallint", "INT" -> "int", "LONG" -> "bigint", "FLOAT" -> "float",
    "DOUBLE" -> "double", "STRING" -> "string", "BINARY" -> "binary",
    "TIMESTAMP" -> "timestamp", "DATE" -> "date",
    "TIMESTAMP_INSTANT" -> "timestamp with local time zone")

  /** Depth-first type-tree rendering in ORC's own hive-style spelling
    * (`struct<doc_id:bigint,...>` — byte-equal to orc-core's
    * `TypeDescription.toString`, OrcSpec-pinned), mirroring the parquet
    * schema-leaf walk.
    */
  def renderType(ctx: String, types: Vector[OrcType], at: Int = 0): String = {
    val t = types(at)
    t.kind match {
      case "STRUCT" =>
        val names = if (t.fieldNames.size == t.subtypes.size) t.fieldNames
          else t.subtypes.indices.map(i => s"_col$i").toVector
        names.zip(t.subtypes).map { case (nm, s) =>
          s"$nm:${renderType(ctx, types, s)}"
        }.mkString("struct<", ",", ">")
      case "LIST" => s"array<${renderType(ctx, types, t.subtypes.head)}>"
      case "MAP" => t.subtypes.map(renderType(ctx, types, _)).mkString("map<", ",", ">")
      case "UNION" => t.subtypes.map(renderType(ctx, types, _)).mkString("uniontype<", ",", ">")
      case "DECIMAL" => s"decimal(${t.precision.getOrElse(38L)},${t.scale.getOrElse(10L)})"
      case "VARCHAR" => s"varchar(${t.maxLength.getOrElse(Long.MaxValue)})"
      case "CHAR" => s"char(${t.maxLength.getOrElse(Long.MaxValue)})"
      case k => HiveNames.getOrElse(k, throw new IllegalArgumentException(
        s"$ctx: type kind $k has no rendering"))
    }
  }

  // ---- q_orc_meta ----------------------------------------------------------------------

  private val PerFile = 100

  /** 100-doc ORC files written by the REAL orc-core (`OrcFile
    * .createWriter`, ZLIB) and their PostScript + Footer walked back by
    * the hand-rolled protobuf machinery — gating the compression kind,
    * stripe census, type tree, row counts, per-column value counts,
    * hasNull flags, the zigzag INT statistics (min / max / SUM of
    * doc_id) and STRING statistics (min / max lang) — every column
    * closed-form in DuckDB from the documents table. The pruning
    * question these stats answer (`doc_id BETWEEN lo AND hi` overlap)
    * is gated the same way as q_parquet_meta's.
    */
  val q_orc_meta: QueryDef = QueryDef(
    s"""SELECT CAST(doc_id // $PerFile AS BIGINT) AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  'ZLIB' AS compression,
       |  CAST(1 AS BIGINT) AS n_stripes,
       |  'struct<doc_id:bigint,text:string,lang:string>' AS schema_str,
       |  CAST(4 AS BIGINT) AS n_types,
       |  CAST(count(*) AS BIGINT) AS id_values,
       |  FALSE AS id_has_null,
       |  CAST(min(doc_id) AS BIGINT) AS id_min,
       |  CAST(max(doc_id) AS BIGINT) AS id_max,
       |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |  min(lang) AS lang_min,
       |  max(lang) AS lang_max,
       |  (min(doc_id) <= 249 AND max(doc_id) >= 150) AS scan_survives
       |FROM documents
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      .groupBy(expr(s"doc_id div $PerFile").as("file_id"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2"), col("lang").as("_3")))).as("docs"))
      .as[(Long, Seq[(Long, String, String)])]
      .mapPartitions { it =>
        it.map { case (fileId, docs) =>
          val ctx = s"file $fileId"
          val bytes = writeViaOrcCore(docs, "ZLIB")
          val m = parseFooter(ctx, bytes)
          def statOf(i: Int): ColStats = {
            if (m.stats.size != m.types.size) throw new IllegalStateException(
              s"$ctx: ${m.stats.size} column statistics for ${m.types.size} types")
            m.stats(i)
          }
          val idS = statOf(1)
          val langS = statOf(3)
          val ints = idS.ints.getOrElse(throw new IllegalStateException(
            s"$ctx: doc_id column lost its intStatistics"))
          val strs = langS.strs.getOrElse(throw new IllegalStateException(
            s"$ctx: lang column lost its stringStatistics"))
          val idMin = ints.min.getOrElse(throw new IllegalStateException(s"$ctx: no int min"))
          val idMax = ints.max.getOrElse(throw new IllegalStateException(s"$ctx: no int max"))
          (fileId, m.numberOfRows, m.compression, m.stripes.size.toLong,
            renderType(ctx, m.types), m.types.size.toLong,
            idS.numberOfValues.getOrElse(-1L),
            idS.hasNull.getOrElse(true),
            idMin, idMax,
            ints.sum.getOrElse(throw new IllegalStateException(s"$ctx: no int sum")),
            strs.min.getOrElse(throw new IllegalStateException(s"$ctx: no string min")),
            strs.max.getOrElse(throw new IllegalStateException(s"$ctx: no string max")),
            idMin <= 249 && idMax >= 150)
        }
      }
      .toDF("file_id", "n_rows", "compression", "n_stripes", "schema_str", "n_types",
        "id_values", "id_has_null", "id_min", "id_max", "id_sum",
        "lang_min", "lang_max", "scan_survives")
      .orderBy(col("file_id"))
  }

  /** Write one (doc_id, text, lang) file through the REAL orc-core —
    * the independent-writer half of the cross-validation.
    */
  def writeViaOrcCore(docs: Seq[(Long, String, String)], codec: String): Array[Byte] = {
    import org.apache.orc.{CompressionKind, OrcFile, TypeDescription}
    import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector, VectorizedRowBatch}
    val schema = TypeDescription.fromString("struct<doc_id:bigint,text:string,lang:string>")
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
    val file = tmp.resolve("g.orc")
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val writer = OrcFile.createWriter(
        new org.apache.hadoop.fs.Path(file.toUri.toString),
        OrcFile.writerOptions(conf).setSchema(schema)
          .compress(CompressionKind.valueOf(codec))
          .overwrite(true))
      try {
        val batch = schema.createRowBatch()
        val ids = batch.cols(0).asInstanceOf[LongColumnVector]
        val texts = batch.cols(1).asInstanceOf[BytesColumnVector]
        val langs = batch.cols(2).asInstanceOf[BytesColumnVector]
        docs.foreach { case (id, text, lang) =>
          if (batch.size == batch.getMaxSize) { writer.addRowBatch(batch); batch.reset() }
          val r = batch.size
          ids.vector(r) = id
          val tb = text.getBytes(UTF_8)
          texts.setVal(r, tb, 0, tb.length)
          val lb = lang.getBytes(UTF_8)
          langs.setVal(r, lb, 0, lb.length)
          batch.size += 1
        }
        if (batch.size > 0) writer.addRowBatch(batch)
      } finally writer.close()
      java.nio.file.Files.readAllBytes(file)
    } finally {
      java.nio.file.Files.deleteIfExists(file)
      // orc-core writes a .crc sidecar through the local raw FS
      val ls = java.nio.file.Files.list(tmp)
      try ls.forEach(p => java.nio.file.Files.deleteIfExists(p)) finally ls.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** The 4-column twin of [[writeViaOrcCore]] for the stripe-data read
    * gate (q_orc_read): adds a NULLABLE `opt_len` bigint —
    * `(doc_id*37+11)%1000`, absent when `doc_id%3==0` — so the PRESENT
    * (boolean RLE) stream carries real nulls.
    */
  def writeViaOrcCoreOpt(docs: Seq[(Long, String, String)], codec: String): Array[Byte] = {
    import org.apache.orc.{CompressionKind, OrcFile, TypeDescription}
    import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector, VectorizedRowBatch}
    val schema = TypeDescription.fromString(
      "struct<doc_id:bigint,text:string,lang:string,opt_len:bigint>")
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
    val file = tmp.resolve("g.orc")
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val writer = OrcFile.createWriter(
        new org.apache.hadoop.fs.Path(file.toUri.toString),
        OrcFile.writerOptions(conf).setSchema(schema)
          .compress(CompressionKind.valueOf(codec))
          .overwrite(true))
      try {
        val batch = schema.createRowBatch()
        val ids = batch.cols(0).asInstanceOf[LongColumnVector]
        val texts = batch.cols(1).asInstanceOf[BytesColumnVector]
        val langs = batch.cols(2).asInstanceOf[BytesColumnVector]
        val opts = batch.cols(3).asInstanceOf[LongColumnVector]
        opts.noNulls = false
        docs.foreach { case (id, text, lang) =>
          if (batch.size == batch.getMaxSize) { writer.addRowBatch(batch); batch.reset(); opts.noNulls = false }
          val r = batch.size
          ids.vector(r) = id
          val tb = text.getBytes(UTF_8)
          texts.setVal(r, tb, 0, tb.length)
          val lb = lang.getBytes(UTF_8)
          langs.setVal(r, lb, 0, lb.length)
          if (id % 3 == 0) opts.isNull(r) = true
          else { opts.isNull(r) = false; opts.vector(r) = (id * 37 + 11) % 1000 }
          batch.size += 1
        }
        if (batch.size > 0) writer.addRowBatch(batch)
      } finally writer.close()
      java.nio.file.Files.readAllBytes(file)
    } finally {
      java.nio.file.Files.deleteIfExists(file)
      val ls = java.nio.file.Files.list(tmp)
      try ls.forEach(p => java.nio.file.Files.deleteIfExists(p)) finally ls.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  val all: Map[String, QueryDef] = Map("q_orc_meta" -> q_orc_meta)
}
