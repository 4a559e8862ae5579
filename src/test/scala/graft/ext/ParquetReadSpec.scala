package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The hand-rolled parquet page-read stack (ParquetRead), cross-
  * validated layer by layer against the real implementations on the
  * classpath: snappy vs snappy-java (xerial — the copy Spark ships),
  * RLE/bit-packed hybrid vs parquet-column's own encoder, and whole
  * files written by spark.write / parquet-mr decoded row-identical to
  * spark.read — snappy, gzip and uncompressed, dictionary and PLAIN,
  * required and optional (null-bearing) columns. Structural damage
  * fails loudly with a byte offset.
  */
class ParquetReadSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-pqread").toString

  // ---- snappy raw-block format ---------------------------------------------------

  private def xerialCompress(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(b)

  test("snappy: xerial-compressed corpora decode byte-identical") {
    val rnd = new java.util.Random(42)
    val corpora = Seq(
      Array.emptyByteArray,
      "a".getBytes(UTF_8),
      ("abcdef" * 500).getBytes(UTF_8), // copy-heavy
      Array.fill[Byte](10000)(0), // max-run
      Array.fill[Byte](4096)(0).map(_ => rnd.nextInt(256).toByte), // incompressible literals > 60
      (0 until 70000).map(i => (i % 251).toByte).toArray // > 64 KiB: far offsets
    )
    corpora.zipWithIndex.foreach { case (c, i) =>
      val back = ParquetRead.snappyUncompress(s"corpus $i", xerialCompress(c))
      assert(java.util.Arrays.equals(back, c), s"corpus $i round-trip")
    }
  }

  test("snappy: hand-built tag streams incl. the overlapping-copy idiom") {
    // preamble 10, literal "ab", copy-1 offset 2 len 8 -> "ababababab"
    val overlap = Array[Byte](10, (1 << 2).toByte, 'a', 'b', ((4 << 2) | 1).toByte, 2)
    new String(ParquetRead.snappyUncompress("overlap", overlap), UTF_8) shouldBe "ababababab"
    // xerial agrees on the same bytes
    new String(org.xerial.snappy.Snappy.uncompress(overlap), UTF_8) shouldBe "ababababab"
  }

  test("snappy: structural damage fails loudly") {
    def boom(b: Array[Byte]): String =
      intercept[IllegalArgumentException](
        ParquetRead.snappyUncompress("bad", b)).getMessage
    // copy offset 0
    boom(Array[Byte](4, (1 << 2).toByte, 'a', 'b', ((4 << 2) | 2).toByte, 0, 0)) should
      include("offset 0")
    // copy reaching before the output start
    boom(Array[Byte](6, (1 << 2).toByte, 'a', 'b', ((4 << 2) | 1).toByte, 9)) should
      include("before the output start")
    // literal crossing the input end
    boom(Array[Byte](9, (8 << 2).toByte, 'a')) should include("crosses the input end")
    // produced less than declared
    boom(Array[Byte](9, (1 << 2).toByte, 'a', 'b')) should include("produced")
  }

  // ---- RLE / bit-packed hybrid ----------------------------------------------------

  private def mrHybridEncode(bitWidth: Int, values: Seq[Int]): Array[Byte] = {
    val enc = new org.apache.parquet.column.values.rle.RunLengthBitPackingHybridEncoder(
      bitWidth, 64, 1 << 20,
      org.apache.parquet.bytes.HeapByteBufferAllocator.getInstance())
    values.foreach(enc.writeInt)
    enc.toBytes.toByteArray
  }

  test("hybrid: parquet-column-encoded streams decode value-identical") {
    val cases = Seq(
      (1, Seq.fill(200)(1) ++ Seq.fill(9)(0) ++ Seq(1, 0, 1)), // long runs + ragged tail
      (3, (0 until 333).map(_ % 8)), // alternating -> bit-packed
      (7, (0 until 100).map(i => (i * 37) % 128)),
      (12, Seq.fill(50)(4095) ++ (0 until 17).map(_ * 99 % 4096)),
      (1, Seq(0)), (20, Seq(1048575, 0, 524288))
    )
    cases.zipWithIndex.foreach { case ((w, vs), i) =>
      val bytes = mrHybridEncode(w, vs)
      val (got, at) = ParquetRead.readHybrid(s"case $i", bytes, 0, bytes.length, w, vs.size)
      got.toSeq shouldBe vs
      assert(at <= bytes.length, s"case $i read past the buffer")
    }
  }

  test("hybrid: truncation and overruns fail loudly") {
    val bytes = mrHybridEncode(4, Seq.fill(100)(7))
    intercept[IllegalArgumentException](
      ParquetRead.readHybrid("trunc", bytes, 0, 1, 4, 100)
    ).getMessage should include("truncated")
    intercept[IllegalArgumentException](
      ParquetRead.readHybrid("overrun", bytes, 0, bytes.length, 4, 99)
    ).getMessage should include("overruns")
  }

  // ---- whole files: the real writers -> our reader --------------------------------

  private def onePartFile(dir: String): Array[Byte] = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    part.length shouldBe 1
    Files.readAllBytes(part.head.toPath)
  }

  private def sampleDf = {
    val rows = (0 until 500).map { i =>
      (i.toLong, s"text-$i-" + ("y" * (i % 23)),
        if (i % 7 == 0) null else Seq("en", "de", "fr", "nl")(i % 4),
        if (i % 5 == 0) None else Some(i * 31L))
    }
    rows.toDF("id", "text", "lang", "num")
  }

  private def decodeToRows(bytes: Array[Byte]): Seq[(Long, String, String, Option[Long])] = {
    val (m, cols) = ParquetRead.readAll("spark-file", bytes)
    val n = m.numRows.toInt
    def strs(p: String) = cols(p).values.map {
      case null => null
      case b: Array[Byte] => new String(b, UTF_8)
    }
    val ids = cols("id").values.map(_.asInstanceOf[Long])
    val nums = cols("num").values.map(v => Option(v).map(_.asInstanceOf[Long]))
    (0 until n).map(i => (ids(i), strs("text")(i), strs("lang")(i), nums(i)))
  }

  for (codec <- Seq("snappy", "gzip", "none", "zstd", "lz4_raw", "lz4")) {
    test(s"spark-written file ($codec) decodes row-identical to spark.read") {
      val dir = tmp() + s"/$codec"
      sampleDf.coalesce(1).write.option("compression", codec).parquet(dir)
      val bytes = onePartFile(dir)
      val ours = decodeToRows(bytes).sortBy(_._1)
      val theirs = spark.read.parquet(dir)
        .as[(Long, String, Option[String], Option[Long])].collect().toSeq
        .map(r => (r._1, r._2, r._3.orNull, r._4)).sortBy(_._1)
      ours shouldBe theirs
      // the low-cardinality column really exercised the dictionary path
      val (_, cols) = ParquetRead.readAll("spark-file", bytes)
      cols("lang").dictEntries shouldBe Some(4)
    }
  }

  test("parquet-mr example writer (the query's writer) round-trips through our reader") {
    val docs = (0 until 257).map(i =>
      (i.toLong, s"body $i " + ("z" * (i % 41)), Seq("en", "sv", "fi")(i % 3)))
    val bytes = ParquetRead.writeViaParquetMr(docs)
    val (m, cols) = ParquetRead.readAll("mr-file", bytes)
    m.numRows shouldBe 257L
    cols("doc_id").values.map(_.asInstanceOf[Long]) shouldBe docs.map(_._1)
    cols("text").values.map(b => new String(b.asInstanceOf[Array[Byte]], UTF_8)) shouldBe
      docs.map(_._2)
    cols("lang").dictEntries shouldBe Some(3)
    // opt_len: null exactly when doc_id % 3 == 0
    cols("opt_len").values.zipWithIndex.foreach { case (v, i) =>
      if (i % 3 == 0) assert(v == null, s"row $i")
      else v shouldBe (i * 37 + 11) % 1000L
    }
  }

  test("our PLAIN/UNCOMPRESSED writer (ParquetLite) reads back through our page reader") {
    val in = (0 until 100).map(i => (i * 3L, s"t$i".getBytes(UTF_8)))
    val bytes = ParquetLite.write(in)
    val (m, cols) = ParquetRead.readAll("lite-file", bytes)
    m.numRows shouldBe 100L
    cols("doc_id").values.map(_.asInstanceOf[Long]) shouldBe in.map(_._1)
    cols("text").values.map(_.asInstanceOf[Array[Byte]].toSeq) shouldBe in.map(_._2.toSeq)
    cols("doc_id").dictEntries shouldBe None
  }

  test("spark-written DATA_PAGE_V2 file decodes row-identical to spark.read") {
    val dir = tmp() + "/v2"
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("parquet.writer.version", "v2")
    try sampleDf.coalesce(1).write.option("compression", "snappy").parquet(dir)
    finally hconf.unset("parquet.writer.version")
    val ours = decodeToRows(onePartFile(dir)).sortBy(_._1)
    val theirs = spark.read.parquet(dir)
      .as[(Long, String, Option[String], Option[Long])].collect().toSeq
      .map(r => (r._1, r._2, r._3.orNull, r._4)).sortBy(_._1)
    ours shouldBe theirs
  }

  test("DELTA_BINARY_PACKED: parquet-column-encoded streams decode value-identical") {
    val alloc = org.apache.parquet.bytes.HeapByteBufferAllocator.getInstance()
    val rnd = new java.util.Random(11)
    val cases = Seq(
      (0 until 1000).map(_.toLong * 3), // monotone
      Seq.fill(700)(42L), // constant
      (0 until 513).map(_ => rnd.nextLong() % 1000000), // noise incl. negatives
      Seq(Long.MaxValue, Long.MinValue + 1, 0L, -1L), // extremes
      Seq(7L) // single value
    )
    cases.zipWithIndex.foreach { case (vs, i) =>
      val w = new org.apache.parquet.column.values.delta.DeltaBinaryPackingValuesWriterForLong(
        64, 1 << 20, alloc)
      vs.foreach(w.writeLong)
      val bytes = w.getBytes.toByteArray
      val (got, at) = ParquetRead.decodeDeltaBinaryPacked(s"dbp $i", bytes, 0,
        bytes.length, vs.size)
      withClue(s"case $i:") { got.toSeq shouldBe vs }
      assert(at <= bytes.length)
    }
  }

  test("DELTA_BYTE_ARRAY: parquet-column-encoded strings decode value-identical") {
    val alloc = org.apache.parquet.bytes.HeapByteBufferAllocator.getInstance()
    val vals = (0 until 400).map(i => s"prefix-shared-${i / 7}-suffix-$i") :+ "" :+ "solo"
    val w = new org.apache.parquet.column.values.deltastrings.DeltaByteArrayWriter(
      64, 1 << 20, alloc)
    vals.foreach(v => w.writeBytes(org.apache.parquet.io.api.Binary.fromString(v)))
    val bytes = w.getBytes.toByteArray
    val (got, _) = ParquetRead.decodeDeltaByteArray("dba", bytes, 0, bytes.length, vals.size)
    got.map(new String(_, UTF_8)) shouldBe vals
  }

  test("the v2 query writer (dictionary off) round-trips through the v2 path") {
    val docs = (0 until 257).map(i =>
      (i.toLong, s"body $i " + ("z" * (i % 41)), Seq("en", "sv", "fi")(i % 3)))
    val bytes = ParquetRead.writeViaParquetMr(docs, v2 = true, dictionary = false)
    val (m, cols) = ParquetRead.readAll("v2-file", bytes)
    m.numRows shouldBe 257L
    cols("doc_id").dictEntries shouldBe None
    cols("doc_id").values.map(_.asInstanceOf[Long]) shouldBe docs.map(_._1)
    cols("text").values.map(b => new String(b.asInstanceOf[Array[Byte]], UTF_8)) shouldBe
      docs.map(_._2)
    cols("opt_len").values.zipWithIndex.foreach { case (v, i) =>
      if (i % 3 == 0) assert(v == null, s"row $i")
      else v shouldBe (i * 37 + 11) % 1000L
    }
  }

  test("q_parquet_read: decoded aggregates match a driver-side recompute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = ParquetRead.q_parquet_read.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    got.length should be > 0
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    got.map(_._2).sum shouldBe docs.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val firstFile = docs.filter(_._1 / 100 == got.head._1)
    val want = md.digest(firstFile.map(_._2).mkString.getBytes(UTF_8))
      .map(x => f"$x%02x").mkString
    got.head._3 shouldBe want
  }
}
