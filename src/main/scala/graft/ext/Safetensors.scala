package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** safetensors — the tensor-file format model weights and embedding
  * shards ship in (public spec: github.com/huggingface/safetensors).
  * Layout: a little-endian u64 header length, a JSON header mapping
  * tensor name → `{dtype, shape, data_offsets}` (offsets relative to
  * the data section) plus an optional string-to-string `__metadata__`,
  * then one contiguous data buffer. Both halves hand-rolled: the writer
  * emits compact JSON space-padded so the data section starts 8-byte
  * aligned (the reference serializer's rule) and lays tensors out
  * back-to-back; the parser is a STRICT walk — header length bounded
  * (the spec's 100 MB cap), a hand-rolled JSON parser for exactly the
  * grammar headers use, and the reference implementation's validation
  * rules enforced: known dtypes, `shape` product × dtype size equal to
  * the offset extent, offsets inside the buffer, NO overlaps and NO
  * gaps (the sorted extents must tile the data section exactly), no
  * duplicate tensor names, metadata values strings only. Every lie
  * fails LOUDLY with the byte offset (the MediaDecoder contract). The
  * JSON layer is cross-validated in SafetensorsSpec against Jackson —
  * the independent JSON implementation on Spark's own classpath.
  *
  * [[q_safetensors]] gates the whole path per shard: the closed-form
  * header geometry (the oracle rebuilds the exact compact JSON string
  * and the 8-byte padding rule in SQL), both tensors' extents, and
  * BIT-EXACT F32 + I64 roundtrips.
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode+parse pass, zero further shuffles — embarrassingly parallel
  * over shards, exactly how sharded checkpoint/embedding dumps are
  * produced and validated.
  */
object Safetensors {

  /** dtype → bytes per element (the spec's table). */
  val dtypeSize: Map[String, Int] = Map(
    "F64" -> 8, "F32" -> 4, "F16" -> 2, "BF16" -> 2,
    "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1, "U8" -> 1, "BOOL" -> 1)

  /** One parsed tensor: dtype, shape, [begin, end) in the data section,
    * and the raw little-endian bytes.
    */
  final case class Tensor(name: String, dtype: String, shape: Vector[Long],
      begin: Long, end: Long, data: Array[Byte]) {
    def floats(docId: Long): Array[Float] = {
      require(dtype == "F32", s"doc $docId: tensor '$name' is $dtype, not F32")
      val out = new Array[Float](data.length / 4)
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(out)
      out
    }
    def longs(docId: Long): Array[Long] = {
      require(dtype == "I64", s"doc $docId: tensor '$name' is $dtype, not I64")
      val out = new Array[Long](data.length / 8)
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
      out
    }
  }

  final case class Parsed(tensors: Vector[Tensor], metadata: Map[String, String],
      headerLen: Int, dataStart: Long)

  // ---- a strict JSON value model + parser (exactly the header grammar) --------

  sealed trait JVal
  final case class JStr(s: String) extends JVal
  final case class JNum(v: Long) extends JVal
  final case class JArr(vs: Vector[JVal]) extends JVal
  /** Insertion-ordered: header key order is part of the written layout. */
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def get(k: String): Option[JVal] = fields.find(_._1 == k).map(_._2)
  }

  /** Strict parser for the JSON subset safetensors headers use: objects,
    * arrays, strings (with escapes), and non-negative integers. Anything
    * else — floats, booleans, null, trailing garbage — fails loudly.
    */
  private[ext] def parseJson(docId: Long, s: String, base: Long): JVal = {
    var p = 0
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: safetensors parse at byte ${base + p}: $why")
    def ws(): Unit = while (p < s.length && (s(p) == ' ' || s(p) == '\t' || s(p) == '\n' || s(p) == '\r')) p += 1
    def expect(c: Char): Unit = { ws(); if (p >= s.length || s(p) != c) fail(s"expected '$c'"); p += 1 }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (p < s.length && s(p) != '"') {
        if (s(p) == '\\') {
          p += 1
          if (p >= s.length) fail("unterminated escape")
          s(p) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (p + 4 >= s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(p + 1, p + 5), 16).toChar
              p += 4
            case other => fail(s"unknown escape '\\$other'")
          }
          p += 1
        } else { sb += s(p); p += 1 }
      }
      if (p >= s.length) fail("unterminated string")
      p += 1
      sb.result()
    }
    def value(): JVal = {
      ws()
      if (p >= s.length) fail("unexpected end of header")
      s(p) match {
        case '"' => JStr(str())
        case '{' =>
          p += 1
          val fields = Vector.newBuilder[(String, JVal)]
          ws()
          if (p < s.length && s(p) == '}') p += 1
          else {
            var go = true
            while (go) {
              val k = str()
              expect(':')
              fields += (k -> value())
              ws()
              if (p < s.length && s(p) == ',') { p += 1; ws() }
              else { expect('}'); go = false }
            }
          }
          JObj(fields.result())
        case '[' =>
          p += 1
          val vs = Vector.newBuilder[JVal]
          ws()
          if (p < s.length && s(p) == ']') p += 1
          else {
            var go = true
            while (go) {
              vs += value()
              ws()
              if (p < s.length && s(p) == ',') { p += 1; ws() }
              else { expect(']'); go = false }
            }
          }
          JArr(vs.result())
        case c if c.isDigit =>
          val start = p
          while (p < s.length && s(p).isDigit) p += 1
          val lit = s.substring(start, p)
          if (lit.length > 1 && lit(0) == '0') fail(s"leading zero in number '$lit'")
          JNum(java.lang.Long.parseLong(lit))
        case other => fail(s"unexpected character '$other' (headers hold objects/arrays/strings/integers only)")
      }
    }
    val v = value()
    ws()
    if (p != s.length) fail("trailing bytes after the header JSON value")
    v
  }

  // ---- encode -----------------------------------------------------------------

  private[ext] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Compact-JSON header (metadata first, tensors in given order),
    * space-padded so the data section starts 8-byte aligned, then the
    * tensors back-to-back.
    */
  def encode(tensors: Seq[(String, String, Seq[Long], Array[Byte])],
      metadata: Seq[(String, String)] = Nil): Array[Byte] = {
    var off = 0L
    val entries = tensors.map { case (name, dtype, shape, data) =>
      val isz = dtypeSize.getOrElse(dtype, throw new IllegalArgumentException(s"dtype $dtype"))
      val count = shape.foldLeft(1L)(_ * _)
      require(count * isz == data.length, s"tensor $name: shape $shape x $isz != ${data.length} bytes")
      val begin = off
      off += data.length
      s""""${jsonEscape(name)}":{"dtype":"$dtype","shape":[${shape.mkString(",")}],"data_offsets":[$begin,$off]}"""
    }
    val metaPart =
      if (metadata.isEmpty) Nil
      else Seq(metadata.map { case (k, v) => s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }
        .mkString("\"__metadata__\":{", ",", "}"))
    val json = (metaPart ++ entries).mkString("{", ",", "}")
    val jsonB = json.getBytes(UTF_8)
    val pad = (8 - (8 + jsonB.length) % 8) % 8
    val headerLen = jsonB.length + pad
    val total = 8L + headerLen + off
    require(total <= Int.MaxValue, s"file of $total bytes unsupported")
    val out = new Array[Byte](total.toInt)
    var h = headerLen.toLong
    var i = 0
    while (i < 8) { out(i) = (h & 0xff).toByte; h >>>= 8; i += 1 }
    System.arraycopy(jsonB, 0, out, 8, jsonB.length)
    java.util.Arrays.fill(out, 8 + jsonB.length, 8 + headerLen, ' '.toByte)
    var pos = 8 + headerLen
    tensors.foreach { case (_, _, _, data) =>
      System.arraycopy(data, 0, out, pos, data.length)
      pos += data.length
    }
    out
  }

  // ---- decode -----------------------------------------------------------------

  private val MaxHeader = 100L * 1000 * 1000 // the spec's sanity cap

  /** Strict parse + the reference implementation's validation rules. */
  def parse(docId: Long, b: Array[Byte]): Parsed = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: safetensors parse at byte $off: $why")
    if (b.length < 8) fail(0L, s"file of ${b.length} bytes cannot hold the header length")
    var hlen = 0L
    var i = 7
    while (i >= 0) { hlen = (hlen << 8) | (b(i) & 0xffL); i -= 1 }
    if (hlen > MaxHeader) fail(0L, s"header of $hlen bytes exceeds the 100 MB spec cap")
    if (8 + hlen > b.length) fail(0L, s"header of $hlen bytes crosses the file end")
    val headerStr = new String(b, 8, hlen.toInt, UTF_8)
    val root = parseJson(docId, headerStr, 8L) match {
      case o: JObj => o
      case _ => fail(8L, "header is not a JSON object")
    }
    val dataStart = 8L + hlen
    val bufLen = b.length - dataStart
    val meta = root.get("__metadata__") match {
      case None => Map.empty[String, String]
      case Some(JObj(fields)) => fields.map {
        case (k, JStr(v)) => k -> v
        case (k, _) => fail(8L, s"__metadata__['$k'] is not a string")
      }.toMap
      case Some(_) => fail(8L, "__metadata__ is not an object")
    }
    val names = root.fields.map(_._1).filter(_ != "__metadata__")
    if (names.distinct.size != names.size) fail(8L, "duplicate tensor names in header")
    val tensors = root.fields.collect { case (name, v) if name != "__metadata__" =>
      val o = v match {
        case o: JObj => o
        case _ => fail(8L, s"tensor '$name' entry is not an object")
      }
      val dtype = o.get("dtype") match {
        case Some(JStr(d)) => d
        case _ => fail(8L, s"tensor '$name' has no string dtype")
      }
      val isz = dtypeSize.getOrElse(dtype,
        fail(8L, s"tensor '$name' dtype '$dtype' unknown"))
      val shape = o.get("shape") match {
        case Some(JArr(vs)) => vs.map {
          case JNum(n) => n
          case _ => fail(8L, s"tensor '$name' shape holds a non-integer")
        }
        case _ => fail(8L, s"tensor '$name' has no shape array")
      }
      val (begin, end) = o.get("data_offsets") match {
        case Some(JArr(Vector(JNum(a), JNum(z)))) => (a, z)
        case _ => fail(8L, s"tensor '$name' has no [begin,end] data_offsets")
      }
      if (begin > end) fail(dataStart + begin, s"tensor '$name' offsets inverted ($begin > $end)")
      if (end > bufLen) fail(dataStart + end, s"tensor '$name' extent $end crosses the ${bufLen}-byte data section")
      val count = shape.foldLeft(1L)(_ * _)
      if (count * isz != end - begin)
        fail(dataStart + begin, s"tensor '$name' shape ${shape.mkString("x")} x $isz bytes != extent ${end - begin}")
      Tensor(name, dtype, shape, begin, end,
        java.util.Arrays.copyOfRange(b, (dataStart + begin).toInt, (dataStart + end).toInt))
    }
    // the reference validation: sorted extents must tile [0, bufLen) with
    // no gaps and no overlaps
    val sorted = tensors.sortBy(t => (t.begin, t.end))
    var cursor = 0L
    sorted.foreach { t =>
      if (t.begin != cursor)
        fail(dataStart + t.begin, s"tensor '${t.name}' begins at ${t.begin}, expected $cursor (gap or overlap)")
      cursor = t.end
    }
    if (cursor != bufLen)
      fail(dataStart + cursor, s"data section of $bufLen bytes not fully covered (tensors end at $cursor)")
    Parsed(tensors, meta, hlen.toInt, dataStart)
  }

  // ---- the oracle-gated query --------------------------------------------------

  private val PerShard = 32

  /** Embeddings → one safetensors shard (`emb` F32 [n,d] + `ids` I64
    * [n], `__metadata__.format = "graft"`) → strict parse back. The
    * oracle rebuilds the exact compact header JSON in SQL and applies
    * the 8-byte alignment rule — gating the full header geometry — and
    * the roundtrip counts gate bit-exact F32/I64 payloads.
    */
  val q_safetensors: QueryDef = QueryDef(
    s"""WITH e AS (SELECT vec_id, vec_id // $PerShard AS shard, len(embedding) AS dim
       |  FROM embeddings),
       |g AS (SELECT shard, count(*) AS n_vecs, max(dim) AS dim FROM e GROUP BY shard),
       |j AS (SELECT shard, n_vecs, dim,
       |    CAST(n_vecs AS BIGINT) * dim * 4 AS emb_bytes,
       |    CAST(n_vecs AS BIGINT) * 8 AS ids_bytes,
       |    length('{"__metadata__":{"format":"graft"},"emb":{"dtype":"F32","shape":['
       |      || CAST(n_vecs AS VARCHAR) || ',' || CAST(dim AS VARCHAR)
       |      || '],"data_offsets":[0,' || CAST(CAST(n_vecs AS BIGINT) * dim * 4 AS VARCHAR)
       |      || ']},"ids":{"dtype":"I64","shape":[' || CAST(n_vecs AS VARCHAR)
       |      || '],"data_offsets":[' || CAST(CAST(n_vecs AS BIGINT) * dim * 4 AS VARCHAR)
       |      || ',' || CAST(CAST(n_vecs AS BIGINT) * dim * 4 + CAST(n_vecs AS BIGINT) * 8 AS VARCHAR)
       |      || ']}}') AS json_len
       |  FROM g),
       |h AS (SELECT shard, n_vecs, dim, emb_bytes, ids_bytes,
       |    json_len + (8 - (8 + json_len) % 8) % 8 AS header_len
       |  FROM j)
       |SELECT CAST(shard AS BIGINT) AS shard, CAST(n_vecs AS BIGINT) AS n_vecs,
       |  CAST(dim AS BIGINT) AS dim,
       |  CAST(header_len AS BIGINT) AS header_len,
       |  CAST(8 + header_len AS BIGINT) AS data_start,
       |  CAST(emb_bytes AS BIGINT) AS emb_end,
       |  CAST(emb_bytes + ids_bytes AS BIGINT) AS ids_end,
       |  CAST(8 + header_len + emb_bytes + ids_bytes AS BIGINT) AS file_bytes,
       |  CAST(CAST(n_vecs AS BIGINT) * dim AS BIGINT) AS emb_exact,
       |  CAST(n_vecs AS BIGINT) AS ids_exact
       |FROM h ORDER BY shard""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .transform(DecodeStage.spread(expr(s"vec_id div $PerShard")))
      .groupBy(expr(s"vec_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(struct(col("vec_id").as("_1"),
        col("embedding").as("_2")))).as("vecs"))
      .as[(Long, Seq[(Long, Seq[Float])])]
      .map { case (shard, vecs) =>
        val n = vecs.size
        val dim = vecs.head._2.size
        val embBuf = ByteBuffer.allocate(n * dim * 4).order(ByteOrder.LITTLE_ENDIAN)
        vecs.foreach { case (_, v) =>
          require(v.size == dim, s"shard $shard: ragged embedding dims")
          v.foreach(embBuf.putFloat)
        }
        val idsBuf = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
        vecs.foreach { case (id, _) => idsBuf.putLong(id) }
        val bytes = encode(
          Seq(("emb", "F32", Seq(n.toLong, dim.toLong), embBuf.array()),
            ("ids", "I64", Seq(n.toLong), idsBuf.array())),
          Seq("format" -> "graft"))
        val parsed = parse(shard, bytes)
        require(parsed.metadata == Map("format" -> "graft"), s"shard $shard: metadata roundtrip")
        val emb = parsed.tensors.find(_.name == "emb").get
        val ids = parsed.tensors.find(_.name == "ids").get
        require(emb.shape == Vector(n.toLong, dim.toLong) && ids.shape == Vector(n.toLong),
          s"shard $shard: shape roundtrip")
        val backF = emb.floats(shard)
        val backI = ids.longs(shard)
        var embExact = 0L
        var j = 0
        vecs.foreach { case (_, v) =>
          v.foreach { x =>
            if (java.lang.Float.floatToRawIntBits(backF(j)) ==
              java.lang.Float.floatToRawIntBits(x)) embExact += 1
            j += 1
          }
        }
        val idsExact = vecs.map(_._1).zip(backI).count { case (a, b) => a == b }.toLong
        (shard, n.toLong, dim.toLong, parsed.headerLen.toLong, parsed.dataStart,
          emb.end, ids.end, bytes.length.toLong, embExact, idsExact)
      }
      .toDF("shard", "n_vecs", "dim", "header_len", "data_start", "emb_end",
        "ids_end", "file_bytes", "emb_exact", "ids_exact")
      .orderBy(col("shard"))
  }

  val all: Map[String, QueryDef] = Map("q_safetensors" -> q_safetensors)
}
