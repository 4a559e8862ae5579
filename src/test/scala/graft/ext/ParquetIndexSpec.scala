package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** H95 — parquet page index + bloom filter, cross-validated
  * field-for-field and verdict-for-verdict against parquet-mr's own
  * readers on the same files, and the hand-rolled XXH64 against
  * parquet-column's XxHash.
  */
class ParquetIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(n: Int): Seq[(Long, String, String)] =
    (0 until n).map(i => (i.toLong, s"body $i " + ("x" * (i % 23)), Seq("en", "sv", "fi", "da")(i % 4)))

  private def openMr(bytes: Array[Byte]) = {
    val tmp = java.nio.file.Files.createTempFile("graft_pidx", ".parquet")
    java.nio.file.Files.write(tmp, bytes)
    val conf = new org.apache.hadoop.conf.Configuration()
    (org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(tmp.toUri.toString), conf)), tmp)
  }

  test("XXH64 is bit-identical to parquet-column's XxHash (0..130-byte inputs + random)") {
    val lib = new org.apache.parquet.column.values.bloomfilter.XxHash()
    val rnd = new scala.util.Random(7)
    (0 to 130).foreach { n =>
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      withClue(s"len $n") {
        ParquetIndex.xxh64(b) shouldBe lib.hashByteBuffer(java.nio.ByteBuffer.wrap(b))
      }
    }
    // plain-encoded longs, the bloom probe shape
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L).foreach { v =>
      val p = ParquetIndex.plainLong(v)
      ParquetIndex.xxh64(p) shouldBe lib.hashByteBuffer(java.nio.ByteBuffer.wrap(p))
    }
  }

  test("page index: our walk matches parquet-mr's readColumnIndex/readOffsetIndex field-for-field") {
    val bytes = ParquetRead.writeViaParquetMr(docs(257), pageRowLimit = Some(20))
    val meta = ParquetLite.parseFooter("pidx", bytes)
    val chunk = meta.groups.head.chunks.find(_.path == "doc_id").get
    val oi = ParquetIndex.parseOffsetIndex("pidx", bytes,
      chunk.offsetIndexOffset.get.toInt, chunk.offsetIndexLength.get.toInt)
    val ci = ParquetIndex.parseColumnIndex("pidx", bytes,
      chunk.columnIndexOffset.get.toInt, chunk.columnIndexLength.get.toInt, isInt64 = true)

    val (reader, tmp) = openMr(bytes)
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val col = block.getColumns.get(0)
      col.getPath.toDotString shouldBe "doc_id"
      val theirOi = reader.readOffsetIndex(col)
      val theirCi = reader.readColumnIndex(col)
      theirOi.getPageCount shouldBe oi.size
      oi.zipWithIndex.foreach { case (loc, i) =>
        loc.offset shouldBe theirOi.getOffset(i)
        loc.compressedSize shouldBe theirOi.getCompressedPageSize(i).toLong
        loc.firstRowIndex shouldBe theirOi.getFirstRowIndex(i)
      }
      ci.boundaryOrder shouldBe theirCi.getBoundaryOrder.name()
      val theirMins = theirCi.getMinValues
      val theirMaxs = theirCi.getMaxValues
      ci.minLongs.zipWithIndex.foreach { case (m, i) =>
        val bb = theirMins.get(i)
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        var v = 0L; (0 until 8).foreach(k => v |= (arr(k) & 0xffL) << (8 * k))
        m shouldBe Some(v)
      }
      ci.maxLongs.zipWithIndex.foreach { case (m, i) =>
        val bb = theirMaxs.get(i)
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        var v = 0L; (0 until 8).foreach(k => v |= (arr(k) & 0xffL) << (8 * k))
        m shouldBe Some(v)
      }
      // 257 rows at 20 per page = 13 pages, the last holding 17
      oi.size shouldBe 13
      oi.last.firstRowIndex shouldBe 240L
    } finally { reader.close(); java.nio.file.Files.deleteIfExists(tmp): Unit }
  }

  test("spark-written page indexes parse identically (the optional column too)") {
    import spark.implicits._
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_pidx_${java.util.UUID.randomUUID()}"
    (0 until 500).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1).write.parquet(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val meta = ParquetLite.parseFooter("spark-pidx", bytes)
    val chunk = meta.groups.head.chunks.find(_.path == "id").get
    val oi = ParquetIndex.parseOffsetIndex("spark-pidx", bytes,
      chunk.offsetIndexOffset.get.toInt, chunk.offsetIndexLength.get.toInt)
    val ci = ParquetIndex.parseColumnIndex("spark-pidx", bytes,
      chunk.columnIndexOffset.get.toInt, chunk.columnIndexLength.get.toInt, isInt64 = true)
    val (reader, tmp) = openMr(bytes)
    try {
      val col = reader.getFooter.getBlocks.get(0).getColumns.get(0)
      val theirOi = reader.readOffsetIndex(col)
      theirOi.getPageCount shouldBe oi.size
      (0 until oi.size).foreach { i =>
        oi(i).offset shouldBe theirOi.getOffset(i)
        oi(i).firstRowIndex shouldBe theirOi.getFirstRowIndex(i)
      }
      ci.boundaryOrder shouldBe reader.readColumnIndex(col).getBoundaryOrder.name()
    } finally { reader.close(); java.nio.file.Files.deleteIfExists(tmp): Unit }
  }

  test("bloom: verdicts are bit-identical to parquet-mr's own filter (present AND absent probes)") {
    val bytes = ParquetRead.writeViaParquetMr(docs(100),
      bloomNdv = Seq("doc_id" -> 100L, "lang" -> 8L))
    val meta = ParquetLite.parseFooter("bloom", bytes)
    val idChunk = meta.groups.head.chunks.find(_.path == "doc_id").get
    val ours = ParquetIndex.parseBloom("bloom", bytes, idChunk.bloomOffset.get.toInt)
    ours.numBytes shouldBe 256
    val (reader, tmp) = openMr(bytes)
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val col = block.getColumns.get(0)
      val theirs = reader.getBloomFilterDataReader(block).readBloomFilter(col)
      theirs should not be null
      theirs.getBitsetSize shouldBe ours.numBytes
      // every probe — the 100 present ids and 400 absent ones — must get
      // the SAME verdict, false positives included
      (0L until 500L).foreach { v =>
        val plain = ParquetIndex.plainLong(v)
        val ourVerdict = ParquetIndex.bloomCheck(ours, plain)
        val theirVerdict = theirs.findHash(theirs.hash(java.lang.Long.valueOf(v)))
        withClue(s"value $v") { ourVerdict shouldBe theirVerdict }
        if (v < 100) withClue(s"present $v") { ourVerdict shouldBe true }
      }
    } finally { reader.close(); java.nio.file.Files.deleteIfExists(tmp): Unit }
  }

  test("bloom: dictionary-encoded columns carry NO bloom; dictionary-off strings do, with no false negatives") {
    // dictionary on: lang stays dictionary-encoded → parquet-mr drops its bloom
    val dictBytes = ParquetRead.writeViaParquetMr(docs(100),
      bloomNdv = Seq("doc_id" -> 100L, "lang" -> 8L))
    val dictMeta = ParquetLite.parseFooter("bloom2", dictBytes)
    dictMeta.groups.head.chunks.find(_.path == "lang").get.bloomOffset shouldBe None
    // dictionary off: the lang bloom IS written and answers string probes
    val bytes = ParquetRead.writeViaParquetMr(docs(100), dictionary = false,
      bloomNdv = Seq("doc_id" -> 100L, "lang" -> 8L))
    val meta = ParquetLite.parseFooter("bloom3", bytes)
    val langChunk = meta.groups.head.chunks.find(_.path == "lang").get
    val bloom = ParquetIndex.parseBloom("bloom3", bytes, langChunk.bloomOffset.get.toInt)
    bloom.numBytes shouldBe 32 // NDV 8 lands on the 32-byte floor
    Seq("en", "sv", "fi", "da").foreach { l =>
      ParquetIndex.bloomCheck(bloom, l.getBytes(UTF_8)) shouldBe true
    }
  }

  test("queries are internally consistent at sf0.001") {
    val pi = ParquetIndex.q_parquet_pageindex.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      pi.count() should be > 0L
      pi.filter("page_rows <> 20").count() shouldBe 0L // 100-doc files tile exactly
      pi.filter("boundary_order <> 'ASCENDING'").count() shouldBe 0L
    } finally pi.unpersist()
    val bl = ParquetIndex.q_parquet_bloom.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      bl.count() should be > 0L
      bl.filter("ids_found <> n_rows").count() shouldBe 0L
    } finally bl.unpersist()
  }
}
