package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** NumPy `.npy` / `.npz` — the format embedding shards actually ship
  * in. Both halves hand-rolled and byte-exact against the PUBLIC numpy
  * format spec (v1.0): magic `\x93NUMPY`, version, little-endian u16
  * header length, the python-dict header (`descr` / `fortran_order` /
  * `shape`) space-padded + newline-terminated so data starts on a
  * 64-byte boundary, then the raw C-order little-endian buffer. The
  * writer replicates numpy's own rendering BYTE-FOR-BYTE (ZipSpec's
  * committed numpy-written goldens gate equality); the parser is a
  * strict walk — magic, version 1.0, a real parser for the dict subset
  * numpy emits, `fortran_order: True` refused loudly, and the file
  * length checked to EXACTLY `header + prod(shape) * itemsize` (trailing
  * or missing bytes are a framing lie). `.npz` is the ZIP composition:
  * STORED `.npy` members through [[Zip]], exactly `numpy.savez`'s
  * layout.
  *
  * [[q_npy_read]] gates the matrix path per vector: the closed-form
  * header geometry (the oracle recomputes numpy's 64-byte padding rule
  * from the digit lengths alone), the per-row random-access offset, and
  * a BIT-EXACT float roundtrip. [[q_npz_embed]] gates the `.npz`
  * composition per shard, including the second member's closed-form
  * data offset behind a STORED first member.
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode+parse pass, zero further shuffles — embarrassingly parallel
  * over shards, exactly how `.npy`-sharded embedding corpora are read.
  */
object Npy {

  /** Parsed array: dtype descr, shape, and the raw LE data buffer. */
  final case class Parsed(descr: String, shape: Vector[Int], data: Array[Byte], dataOffset: Int) {
    def floats(docId: Long): Array[Float] = {
      require(descr == "<f4", s"doc $docId: NPY dtype $descr is not <f4")
      val out = new Array[Float](data.length / 4)
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(out)
      out
    }
    def longs(docId: Long): Array[Long] = {
      require(descr == "<i8", s"doc $docId: NPY dtype $descr is not <i8")
      val out = new Array[Long](data.length / 8)
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
      out
    }
    def doubles(docId: Long): Array[Double] = {
      require(descr == "<f8", s"doc $docId: NPY dtype $descr is not <f8")
      val out = new Array[Double](data.length / 8)
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
      out
    }
  }

  private def itemSize(docId: Long, descr: String): Int = descr match {
    case "<f4" => 4
    case "<f8" => 8
    case "<i8" => 8
    case other => throw new IllegalArgumentException(s"doc $docId: NPY dtype '$other' unsupported")
  }

  // ---- encode (numpy's exact rendering) ---------------------------------------

  /** The header dict exactly as numpy writes it: 1-D shapes render as
    * `(n,)`, higher ranks as `(a, b)`.
    */
  private def headerDict(descr: String, shape: Seq[Int]): String = {
    val shapeStr = shape match {
      case Seq(n) => s"($n,)"
      case s => s.mkString("(", ", ", ")")
    }
    s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
  }

  /** numpy's v1.0 layout: pad with spaces + trailing newline so
    * `10 + headerLen` is a multiple of 64.
    */
  def encodeNpy(descr: String, shape: Seq[Int], data: Array[Byte]): Array[Byte] = {
    val dict = headerDict(descr, shape)
    val hlen = ((10 + dict.length + 1 + 63) / 64) * 64 - 10
    val total = 10 + hlen + data.length
    val out = new Array[Byte](total)
    val magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0)
    System.arraycopy(magic, 0, out, 0, 8)
    out(8) = (hlen & 0xff).toByte
    out(9) = ((hlen >>> 8) & 0xff).toByte
    val dictB = dict.getBytes(US_ASCII)
    System.arraycopy(dictB, 0, out, 10, dictB.length)
    java.util.Arrays.fill(out, 10 + dictB.length, 10 + hlen - 1, ' '.toByte)
    out(10 + hlen - 1) = '\n'
    System.arraycopy(data, 0, out, 10 + hlen, data.length)
    out
  }

  def encodeF4(rows: Int, cols: Int, values: Array[Float]): Array[Byte] = {
    require(values.length == rows * cols, s"matrix $rows x $cols needs ${rows * cols} values")
    val buf = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    buf.asFloatBuffer().put(values)
    encodeNpy("<f4", Seq(rows, cols), buf.array())
  }

  def encodeI8(values: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(values)
    encodeNpy("<i8", Seq(values.length), buf.array())
  }

  // ---- decode -----------------------------------------------------------------

  /** Strict parse of a v1.0 `.npy` file. */
  def parseNpy(docId: Long, b: Array[Byte]): Parsed = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: NPY parse at byte $off: $why")
    if (b.length < 10) fail(0L, s"file of ${b.length} bytes cannot hold the magic + header length")
    if (b(0) != 0x93.toByte || new String(b, 1, 5, US_ASCII) != "NUMPY")
      fail(0L, "bad magic (not \\x93NUMPY)")
    if (b(6) != 1 || b(7) != 0) fail(6L, s"format version ${b(6)}.${b(7)} unsupported (need 1.0)")
    val hlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (10 + hlen > b.length) fail(8L, s"header of $hlen bytes crosses the file end")
    if ((10 + hlen) % 64 != 0) fail(8L, s"header end ${10 + hlen} is not 64-byte aligned")
    if (b(10 + hlen - 1) != '\n') fail(10L + hlen - 1, "header is not newline-terminated")
    val header = new String(b, 10, hlen, US_ASCII)

    // strict parse of the dict subset numpy emits
    var p = 0
    def skipWs(): Unit = while (p < header.length && (header(p) == ' ' || header(p) == '\n')) p += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (p >= header.length || header(p) != c) fail(10L + p, s"expected '$c' in header dict")
      p += 1
    }
    def pyString(): String = {
      expect('\'')
      val start = p
      while (p < header.length && header(p) != '\'') p += 1
      if (p >= header.length) fail(10L + start, "unterminated string in header dict")
      val s = header.substring(start, p)
      p += 1
      s
    }
    def pyInt(): Int = {
      skipWs()
      val start = p
      while (p < header.length && header(p).isDigit) p += 1
      if (p == start) fail(10L + start, "expected an integer in header dict")
      header.substring(start, p).toInt
    }
    expect('{')
    var descr: Option[String] = None
    var fortran: Option[Boolean] = None
    var shape: Option[Vector[Int]] = None
    var more = true
    while (more) {
      skipWs()
      if (p < header.length && header(p) == '}') { p += 1; more = false }
      else {
        val key = pyString()
        expect(':')
        key match {
          case "descr" => descr = Some(pyString())
          case "fortran_order" =>
            skipWs()
            if (header.startsWith("False", p)) { fortran = Some(false); p += 5 }
            else if (header.startsWith("True", p)) { fortran = Some(true); p += 4 }
            else fail(10L + p, "fortran_order is neither True nor False")
          case "shape" =>
            expect('(')
            val dims = Vector.newBuilder[Int]
            skipWs()
            if (p < header.length && header(p) == ')') p += 1
            else {
              var go = true
              while (go) {
                dims += pyInt()
                skipWs()
                if (p < header.length && header(p) == ',') {
                  p += 1; skipWs()
                  if (p < header.length && header(p) == ')') { p += 1; go = false }
                } else if (p < header.length && header(p) == ')') { p += 1; go = false }
                else fail(10L + p, "malformed shape tuple")
              }
            }
            shape = Some(dims.result())
          case other => fail(10L + p, s"unknown header key '$other'")
        }
        skipWs()
        if (p < header.length && header(p) == ',') p += 1
      }
    }
    val d = descr.getOrElse(fail(10L, "header dict has no 'descr'"))
    val f = fortran.getOrElse(fail(10L, "header dict has no 'fortran_order'"))
    val sh = shape.getOrElse(fail(10L, "header dict has no 'shape'"))
    if (f) fail(10L, "fortran_order arrays unsupported (C order only)")
    val isz = itemSize(docId, d)
    val count = sh.foldLeft(1L)(_ * _)
    val expected = 10L + hlen + count * isz
    if (b.length.toLong != expected)
      fail(b.length.toLong, s"file is ${b.length} bytes, header declares $expected")
    Parsed(d, sh, java.util.Arrays.copyOfRange(b, 10 + hlen, b.length), 10 + hlen)
  }

  /** `.npz` = ZIP of STORED `.npy` members (numpy.savez's layout). */
  def encodeNpz(members: Seq[(String, Array[Byte])]): Array[Byte] =
    Zip.encodeZip(members.map { case (name, npy) => Zip.Spec(name, npy, deflate = false) })

  def parseNpz(docId: Long, b: Array[Byte]): Vector[(String, Parsed, Long)] =
    Zip.parseZip(docId, b).map(e => (e.name, parseNpy(docId, e.payload), e.dataOffset))

  // ---- the oracle-gated queries ------------------------------------------------

  private val PerShard = 32

  /** Embeddings → per-shard `<f4>` matrix `.npy` → strict parse back.
    * `header_len`/`data_offset` are numpy's 64-byte padding rule
    * recomputed closed-form by the oracle from digit lengths alone;
    * `vec_offset` is the per-row random-access index math; `exact` is
    * the BIT-EXACT float roundtrip count (gated to equal `dim`).
    */
  val q_npy_read: QueryDef = QueryDef(
    s"""WITH e AS (SELECT vec_id, vec_id // $PerShard AS shard, len(embedding) AS dim
       |  FROM embeddings),
       |g AS (SELECT shard, count(*) AS n_vecs, max(dim) AS dim,
       |    57 + length(CAST(count(*) AS VARCHAR)) + length(CAST(max(dim) AS VARCHAR)) AS dictlen
       |  FROM e GROUP BY shard),
       |h AS (SELECT shard, n_vecs, dim,
       |    ((10 + dictlen + 1 + 63) // 64) * 64 - 10 AS header_len
       |  FROM g)
       |SELECT e.vec_id, CAST(e.shard AS BIGINT) AS shard,
       |  CAST(h.n_vecs AS BIGINT) AS n_vecs,
       |  CAST(e.dim AS BIGINT) AS dim,
       |  CAST(h.header_len AS BIGINT) AS header_len,
       |  CAST(10 + h.header_len AS BIGINT) AS data_offset,
       |  CAST(10 + h.header_len + CAST(h.n_vecs AS BIGINT) * h.dim * 4 AS BIGINT) AS npy_bytes,
       |  CAST(10 + h.header_len
       |    + (rank() OVER (PARTITION BY e.shard ORDER BY e.vec_id) - 1) * e.dim * 4
       |    AS BIGINT) AS vec_offset,
       |  CAST(e.dim AS BIGINT) AS exact
       |FROM e JOIN h ON e.shard = h.shard
       |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .transform(DecodeStage.spread(expr(s"vec_id div $PerShard")))
      .groupBy(expr(s"vec_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(struct(col("vec_id").as("_1"),
        col("embedding").as("_2")))).as("vecs"))
      .as[(Long, Seq[(Long, Seq[Float])])]
      .flatMap { case (shard, vecs) =>
        val n = vecs.size
        val dim = vecs.head._2.size
        val flat = new Array[Float](n * dim)
        var i = 0
        vecs.foreach { case (_, v) =>
          require(v.size == dim, s"shard $shard: ragged embedding dims")
          v.foreach { x => flat(i) = x; i += 1 }
        }
        val npy = encodeF4(n, dim, flat)
        val parsed = parseNpy(shard, npy)
        require(parsed.shape == Vector(n, dim), s"shard $shard: roundtrip shape ${parsed.shape}")
        val back = parsed.floats(shard)
        vecs.zipWithIndex.map { case ((id, v), row) =>
          var exact = 0L
          var j = 0
          while (j < dim) {
            if (java.lang.Float.floatToRawIntBits(back(row * dim + j)) ==
              java.lang.Float.floatToRawIntBits(v(j))) exact += 1
            j += 1
          }
          (id, shard, n.toLong, dim.toLong, (parsed.dataOffset - 10).toLong,
            parsed.dataOffset.toLong, npy.length.toLong,
            parsed.dataOffset.toLong + row.toLong * dim * 4, exact)
        }
      }
      .toDF("vec_id", "shard", "n_vecs", "dim", "header_len", "data_offset",
        "npy_bytes", "vec_offset", "exact")
      .orderBy(col("vec_id"))
  }

  /** Embeddings → `.npz` shard (`emb.npy` f4 matrix + `ids.npy` i8
    * vector, both STORED) → ZIP + NPY parse back. The second member's
    * data offset is closed-form behind the stored first member — the
    * exact seek an `numpy.load(npz)['ids']` does.
    */
  val q_npz_embed: QueryDef = QueryDef(
    s"""WITH e AS (SELECT vec_id, vec_id // $PerShard AS shard, len(embedding) AS dim
       |  FROM embeddings),
       |g AS (SELECT shard, count(*) AS n_vecs, max(dim) AS dim,
       |    57 + length(CAST(count(*) AS VARCHAR)) + length(CAST(max(dim) AS VARCHAR)) AS dictlen,
       |    56 + length(CAST(count(*) AS VARCHAR)) AS dictlen_ids
       |  FROM e GROUP BY shard),
       |h AS (SELECT shard, n_vecs, dim,
       |    ((10 + dictlen + 1 + 63) // 64) * 64 AS emb_hdr,
       |    ((10 + dictlen_ids + 1 + 63) // 64) * 64 AS ids_hdr
       |  FROM g),
       |z AS (SELECT shard, n_vecs, dim, emb_hdr, ids_hdr,
       |    emb_hdr + CAST(n_vecs AS BIGINT) * dim * 4 AS emb_npy_bytes,
       |    ids_hdr + CAST(n_vecs AS BIGINT) * 8 AS ids_npy_bytes
       |  FROM h)
       |SELECT CAST(shard AS BIGINT) AS shard, CAST(n_vecs AS BIGINT) AS n_vecs,
       |  CAST(dim AS BIGINT) AS dim,
       |  CAST(emb_npy_bytes AS BIGINT) AS emb_npy_bytes,
       |  CAST(ids_npy_bytes AS BIGINT) AS ids_npy_bytes,
       |  CAST(37 + emb_hdr AS BIGINT) AS emb_data_offset,
       |  CAST(37 + emb_npy_bytes + 37 + ids_hdr AS BIGINT) AS ids_data_offset,
       |  CAST(n_vecs AS BIGINT) AS ids_exact,
       |  CAST(CAST(n_vecs AS BIGINT) * dim AS BIGINT) AS emb_exact
       |FROM z ORDER BY shard""".stripMargin) { (s, dir) =>
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
        val flat = new Array[Float](n * dim)
        var i = 0
        vecs.foreach { case (_, v) => v.foreach { x => flat(i) = x; i += 1 } }
        val embNpy = encodeF4(n, dim, flat)
        val idsNpy = encodeI8(vecs.map(_._1).toArray)
        val npz = encodeNpz(Seq("emb.npy" -> embNpy, "ids.npy" -> idsNpy))
        val members = parseNpz(shard, npz)
        require(members.map(_._1) == Vector("emb.npy", "ids.npy"),
          s"shard $shard: member census ${members.map(_._1)}")
        val (_, embBack, embOff) = members(0)
        val (_, idsBack, idsOff) = members(1)
        val backF = embBack.floats(shard)
        val backI = idsBack.longs(shard)
        var embExact = 0L
        var j = 0
        while (j < flat.length) {
          if (java.lang.Float.floatToRawIntBits(backF(j)) ==
            java.lang.Float.floatToRawIntBits(flat(j))) embExact += 1
          j += 1
        }
        val idsExact = vecs.map(_._1).zip(backI).count { case (a, b) => a == b }.toLong
        (shard, n.toLong, dim.toLong, embNpy.length.toLong, idsNpy.length.toLong,
          embOff + embBack.dataOffset, idsOff + idsBack.dataOffset,
          idsExact, embExact)
      }
      .toDF("shard", "n_vecs", "dim", "emb_npy_bytes", "ids_npy_bytes",
        "emb_data_offset", "ids_data_offset", "ids_exact", "emb_exact")
      .orderBy(col("shard"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_npy_read" -> q_npy_read,
    "q_npz_embed" -> q_npz_embed)
}
