package graft.ext

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef

/** Roaring bitmaps — the compressed integer-set format row-level
  * DELETION VECTORS ride in both modern table formats (Delta DVs,
  * Iceberg v3 position deletes). Hand-rolled against the public
  * RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec):
  * cookie 12346 (no run containers, u32 container count follows) or
  * 12347 (run-aware: count-1 in the cookie's high 16 bits + a run
  * marker bitset), the descriptive header of (u16 key, u16
  * cardinality-1) pairs, the offset header (always under cookie 12346;
  * under 12347 only at ≥4 containers), then the containers: ARRAY
  * (sorted u16s, card ≤ 4096), BITMAP (1024 u64 words), RUN (u16 run
  * count, then (start, length-1) pairs). The reader is STRICT — keys
  * must ascend, offsets must point exactly where the walk lands,
  * array values must ascend, runs must ascend and not overlap, and the
  * walk must end exactly at the buffer end. The writer emits the
  * canonical no-run form — byte-identical to
  * `org.roaringbitmap.RoaringBitmap.serialize` (the library Spark
  * ships), which RoaringSpec pins both directions, run containers
  * included via the library's `runOptimize`.
  *
  * [[q_deletion_vector]] is the table-format read path: one KB-scale
  * DV per data file marking deleted ROW POSITIONS, scan = parquet read
  * + per-file row index + a broadcast anti-join against the exploded
  * DV — exactly how a DV-aware reader filters, and why it scales: the
  * vectors stay KB-sized per file at any corpus size.
  */
object Roaring {

  private val CookieNoRun = 12346
  private val CookieRun = 12347

  // ---- encode (canonical no-run form, the library's layout) -------------------

  /** Serialize a sorted set of non-negative ints (the portable format,
    * cookie 12346). Byte-identical to the library's `serialize` for
    * bitmaps without run containers.
    */
  def serialize(values: Seq[Int]): Array[Byte] = {
    require(values.forall(_ >= 0), "roaring holds unsigned 32-bit values")
    val sorted = values.distinct.sorted
    val byKey = sorted.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream(64 + sorted.size * 2)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
    le32(CookieNoRun)
    le32(byKey.size)
    byKey.foreach { case (key, vs) => le16(key); le16(vs.size - 1) }
    // offset header: distance from the buffer START to each container
    var off = 4 + 4 + byKey.size * 4 + byKey.size * 4
    byKey.foreach { case (_, vs) =>
      le32(off)
      off += (if (vs.size <= 4096) vs.size * 2 else 8192)
    }
    byKey.foreach { case (_, vs) =>
      if (vs.size <= 4096) vs.foreach(v => le16(v & 0xffff))
      else {
        val words = new Array[Long](1024)
        vs.foreach { v => val lo = v & 0xffff; words(lo >>> 6) |= 1L << (lo & 63) }
        words.foreach { w =>
          var x = w
          var i = 0
          while (i < 8) { out.write((x & 0xff).toInt); x >>>= 8; i += 1 }
        }
      }
    }
    out.toByteArray
  }

  // ---- decode (strict, both cookies, all three container types) ---------------

  /** Strict walk → the sorted values. */
  def deserialize(ctx: String, b: Array[Byte]): Vector[Int] = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"$ctx: roaring decode at byte $off: $why")
    def u16(p: Int): Int = {
      if (p + 2 > b.length) fail(p, "truncated u16")
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Int = {
      if (p + 4 > b.length) fail(p, "truncated u32")
      u16(p) | (u16(p + 2) << 16)
    }
    if (b.length < 8) fail(0, s"${b.length} bytes cannot hold a roaring header")
    val cookie = u32(0)
    val (nContainers, runMarkers, headerStart) =
      if (cookie == CookieNoRun) (u32(4), Array.empty[Byte], 8)
      else if ((cookie & 0xffff) == CookieRun) {
        val n = (cookie >>> 16) + 1
        val markerBytes = (n + 7) / 8
        if (8 + markerBytes > b.length) fail(4, "run marker bitset crosses the buffer end")
        (n, java.util.Arrays.copyOfRange(b, 4, 4 + markerBytes), 4 + markerBytes)
      } else fail(0, s"unknown cookie $cookie")
    if (nContainers < 0) fail(4, s"negative container count $nContainers")
    def isRun(i: Int): Boolean =
      runMarkers.nonEmpty && (runMarkers(i / 8) & (1 << (i % 8))) != 0
    // descriptive header
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var p = headerStart
    var i = 0
    while (i < nContainers) {
      keys(i) = u16(p); cards(i) = u16(p + 2) + 1; p += 4
      if (i > 0 && keys(i) <= keys(i - 1)) fail(p - 4, s"container keys not ascending (${keys(i - 1)} then ${keys(i)})")
      i += 1
    }
    // offset header: always under 12346; under 12347 only at >= 4 containers
    val hasOffsets = cookie == CookieNoRun || nContainers >= 4
    val offsets = new Array[Int](nContainers)
    if (hasOffsets) {
      i = 0
      while (i < nContainers) { offsets(i) = u32(p); p += 4; i += 1 }
    }
    val out = Vector.newBuilder[Int]
    i = 0
    while (i < nContainers) {
      if (hasOffsets && offsets(i) != p)
        fail(p, s"container $i starts at $p, offset header declares ${offsets(i)}")
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = u16(p); p += 2
        var total = 0
        var prevEnd = -1
        var r = 0
        while (r < nRuns) {
          val start = u16(p)
          val len = u16(p + 2) + 1
          p += 4
          if (start <= prevEnd) fail(p - 4, s"runs not ascending/disjoint (start $start after end $prevEnd)")
          if (start + len - 1 > 0xffff) fail(p - 4, s"run [$start,+$len) leaves the 16-bit space")
          var v = start
          while (v < start + len) { out += (base | v); v += 1 }
          prevEnd = start + len - 1
          total += len
          r += 1
        }
        if (total != cards(i)) fail(p, s"run container holds $total values, header declares ${cards(i)}")
      } else if (cards(i) <= 4096) {
        var prev = -1
        var j = 0
        while (j < cards(i)) {
          val v = u16(p); p += 2
          if (v <= prev) fail(p - 2, s"array values not ascending ($prev then $v)")
          out += (base | v)
          prev = v
          j += 1
        }
      } else {
        if (p + 8192 > b.length) fail(p, "bitmap container crosses the buffer end")
        var total = 0
        var w = 0
        while (w < 1024) {
          var word = 0L
          var k = 0
          while (k < 8) { word |= (b(p) & 0xffL) << (8 * k); p += 1; k += 1 }
          var bit = 0
          while (word != 0) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            bit += t
            out += (base | (w * 64 + bit))
            word >>>= (t + 1)
            bit += 1
            total += 1
          }
          w += 1
        }
        if (total != cards(i)) fail(p, s"bitmap container holds $total bits, header declares ${cards(i)}")
      }
      i += 1
    }
    if (p != b.length) fail(p, s"walk ended at $p, buffer holds ${b.length} bytes")
    out.result()
  }

  // ---- the oracle-gated query --------------------------------------------------

  private val DocsPerFile = 50L

  /** Data files from our parquet writer + one roaring DELETION VECTOR
    * per file marking the row positions of `doc_id % 7 == 0`; the scan
    * reads the files, derives each row's position, and anti-joins the
    * broadcast-exploded DVs — every surviving row gated closed-form,
    * plus the DV geometry (`16 + 2 x cardinality` bytes in the
    * canonical single-array-container form).
    */
  val q_deletion_vector: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $DocsPerFile AS fid,
       |    row_number() OVER (PARTITION BY doc_id // $DocsPerFile ORDER BY doc_id) - 1 AS row_idx
       |  FROM documents),
       |g AS (SELECT fid, count(*) FILTER (WHERE doc_id % 7 = 0) AS dv_card FROM d GROUP BY fid)
       |SELECT d.doc_id, CAST(d.fid AS BIGINT) AS file_id,
       |  CAST(d.row_idx AS BIGINT) AS row_idx,
       |  CAST(g.dv_card AS BIGINT) AS dv_card,
       |  CAST(16 + 2 * g.dv_card AS BIGINT) AS dv_bytes
       |FROM d JOIN g ON d.fid = g.fid
       |WHERE d.doc_id % 7 <> 0
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_dv_${java.util.UUID.randomUUID()}"
    Files.createDirectories(Paths.get(out))
    // write the data files + one DV per file (distributed, bounded groups)
    val dvs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $DocsPerFile")))
      .groupBy(expr(s"doc_id div $DocsPerFile").as("fid"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2")))).as("rows"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (fid, rows) =>
        val bytes = ParquetLite.write(rows.map { case (id, t) => (id, t.getBytes(UTF_8)) })
        Files.write(Paths.get(out, f"part-$fid%05d.parquet"), bytes)
        val deletedIdx = rows.zipWithIndex.collect { case ((id, _), idx) if id % 7 == 0 => idx }
        val dv = serialize(deletedIdx)
        // the DV roundtrips through the strict walk before it is trusted
        require(deserialize(s"dv $fid", dv) == deletedIdx.toVector,
          s"file $fid: deletion vector did not roundtrip")
        (fid, dv.length.toLong, deletedIdx.size.toLong,
          deletedIdx.map(_.toLong).toArray)
      }
      .collect().sortBy(_._1)
    if (dvs.isEmpty)
      // an empty corpus writes no files: empty frame, not a no-path scan
      Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("doc_id", "file_id", "row_idx", "dv_card", "dv_bytes")
    else {
      // KB-scale per file: explode to (file_id, row_idx) and broadcast
      val deleted = dvs.flatMap { case (fid, _, _, idxs) => idxs.map(i => (fid, i)) }
        .toSeq.toDF("del_fid", "del_idx")
      val geometry = dvs.map { case (fid, bytes, card, _) => (fid, bytes, card) }
        .toSeq.toDF("file_id", "dv_bytes", "dv_card")
      val w = Window.partitionBy(col("file_id")).orderBy(col("doc_id"))
      // schema pinned (our own writer): no footer-inference pass (guide §6)
      s.read.schema("doc_id BIGINT, text STRING")
        .parquet(dvs.map(d => s"$out/part-${"%05d".format(d._1)}.parquet"): _*)
        .withColumn("file_id", expr(s"doc_id div $DocsPerFile"))
        .withColumn("row_idx", row_number().over(w).cast("long") - 1)
        .join(broadcast(deleted), col("file_id") === col("del_fid") &&
          col("row_idx") === col("del_idx"), "left_anti")
        .join(broadcast(geometry), "file_id")
        .select(col("doc_id"), col("file_id"), col("row_idx"),
          col("dv_card"), col("dv_bytes"))
        .orderBy(col("doc_id"))
    }
  }

  val all: Map[String, QueryDef] = Map("q_deletion_vector" -> q_deletion_vector)
}
