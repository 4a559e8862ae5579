package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

// The REAL parquet-mr (the implementation Spark itself reads through) —
// the independent half our footer walk and our writer are cross-validated
// against. Test-only; main code never imports it.
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Parquet framing + thrift-compact footer walk (ParquetLite): our
  * writer's files read row-identical through Spark; Spark-written
  * footers (snappy, dictionary, logical types, multiple files) parse
  * under our walk field-for-field equal to parquet-mr's own footer
  * read; thrift primitives round-trip; structural damage fails loudly.
  */
class ParquetSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-parquet").toString

  private def rows(n: Int, seed: Int = 1): Seq[(Long, String)] =
    (0 until n).map(i => (seed * 1000L + i, s"text $seed-$i " + ("x" * (i % 37))))

  // ---- direction 1: OUR writer -> the real reader --------------------------------

  test("our files read back row-identical through spark.read.parquet") {
    val dir = tmp()
    val in = rows(257)
    val bytes = ParquetLite.write(in.map { case (id, t) => id -> t.getBytes(UTF_8) })
    Files.write(Paths.get(dir, "ours.parquet"), bytes)
    val back = spark.read.parquet(s"$dir/ours.parquet")
    back.schema.fieldNames.toSeq shouldBe Seq("doc_id", "text")
    back.as[(Long, String)].collect().sortBy(_._1) shouldBe in
  }

  test("our files parse under parquet-mr's own footer reader, field-for-field") {
    val dir = tmp()
    val in = rows(100, seed = 7)
    val bytes = ParquetLite.write(in.map { case (id, t) => id -> t.getBytes(UTF_8) })
    val p = Paths.get(dir, "ours.parquet")
    Files.write(p, bytes)
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(p.toString), spark.sparkContext.hadoopConfiguration)).getFooter
    footer.getFileMetaData.getCreatedBy shouldBe ParquetLite.CreatedBy
    val block = footer.getBlocks.get(0)
    block.getRowCount shouldBe 100L
    val cols = block.getColumns
    cols.size shouldBe 2
    cols.get(0).getPath.toDotString shouldBe "doc_id"
    cols.get(0).getCodec.name shouldBe "UNCOMPRESSED"
    val st = cols.get(0).getStatistics
    st.genericGetMin.asInstanceOf[Long] shouldBe in.map(_._1).min
    st.genericGetMax.asInstanceOf[Long] shouldBe in.map(_._1).max
    st.getNumNulls shouldBe 0L
    // and OUR walk agrees with parquet-mr on OUR file too
    val m = ParquetLite.parseFooter("ours", bytes)
    m.numRows shouldBe block.getRowCount
    m.groups.head.chunks.map(_.dataPageOffset) shouldBe
      (0 until 2).map(i => cols.get(i).getFirstDataPageOffset).toVector
  }

  // ---- direction 2: SPARK's writer -> our walk ------------------------------------

  test("Spark-written footers (snappy + dictionary + logical types) parse " +
      "field-for-field equal to parquet-mr") {
    val dir = tmp()
    rows(2000).toDF("doc_id", "text")
      .withColumn("score", $"doc_id" % 13 * 0.5)
      .withColumn("flag", $"doc_id" % 2 === 0)
      .coalesce(1).write.parquet(s"$dir/spark")
    val files = Files.list(Paths.get(dir, "spark")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    files should not be empty
    for (f <- files) {
      val bytes = Files.readAllBytes(Paths.get(f))
      val ours = ParquetLite.parseFooter(f, bytes)
      val mr = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f), spark.sparkContext.hadoopConfiguration)).getFooter
      ours.createdBy shouldBe Some(mr.getFileMetaData.getCreatedBy)
      ours.numRows shouldBe mr.getBlocks.get(0).getRowCount * mr.getBlocks.size
      ours.leaves.map(_.path) shouldBe Vector("doc_id", "text", "score", "flag")
      ours.leaves.map(_.typ) shouldBe
        Vector("INT64", "BYTE_ARRAY", "DOUBLE", "BOOLEAN")
      ours.groups.size shouldBe mr.getBlocks.size
      ours.groups.zip(mr.getBlocks.toArray.toSeq).foreach {
        case (og, b: org.apache.parquet.hadoop.metadata.BlockMetaData) =>
          og.numRows shouldBe b.getRowCount
          og.totalByteSize shouldBe b.getTotalByteSize
          og.chunks.zip(b.getColumns.toArray.toSeq).foreach {
            case (oc, c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData) =>
              oc.path shouldBe c.getPath.toDotString
              oc.codec shouldBe c.getCodec.name
              oc.numValues shouldBe c.getValueCount
              oc.totalUncompressed shouldBe c.getTotalUncompressedSize
              oc.totalCompressed shouldBe c.getTotalSize
              oc.dataPageOffset shouldBe c.getFirstDataPageOffset
              oc.nullCount shouldBe Some(c.getStatistics.getNumNulls)
              if (oc.typ == "INT64") {
                oc.minLong shouldBe Some(c.getStatistics.genericGetMin.asInstanceOf[Long])
                oc.maxLong shouldBe Some(c.getStatistics.genericGetMax.asInstanceOf[Long])
              }
              if (c.getDictionaryPageOffset > 0)
                oc.dictPageOffset shouldBe Some(c.getDictionaryPageOffset)
          }
      }
      // the pruning verdict our walk derives matches a real Spark scan
      val lo = 1200L; val hi = 1500L
      val idChunk = ours.groups.head.chunks.find(_.path == "doc_id").get
      val survives = idChunk.minLong.get <= hi && idChunk.maxLong.get >= lo
      val actual = spark.read.parquet(s"$dir/spark")
        .filter($"doc_id".between(lo, hi)).count() > 0
      survives shouldBe actual
    }
  }

  test("a multi-row-group Spark file walks group-for-group") {
    val dir = tmp()
    // force several row groups via a tiny block size
    val big = (0 until 5000).map(i => (i.toLong, "y" * 200))
    big.toDF("doc_id", "text").coalesce(1).write
      .option("parquet.block.size", 64 * 1024)
      .parquet(s"$dir/multi")
    val f = Files.list(Paths.get(dir, "multi")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val bytes = Files.readAllBytes(Paths.get(f))
    val ours = ParquetLite.parseFooter(f, bytes)
    val mr = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(f), spark.sparkContext.hadoopConfiguration)).getFooter
    mr.getBlocks.size should be > 1
    ours.groups.size shouldBe mr.getBlocks.size
    ours.groups.map(_.numRows).sum shouldBe 5000L
    ours.numRows shouldBe 5000L
    // per-group min/max stats enable INTRA-file pruning: ranges are disjoint
    val ranges = ours.groups.map(g => {
      val c = g.chunks.find(_.path == "doc_id").get
      (c.minLong.get, c.maxLong.get)
    })
    ranges.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      aMax should be < bMin
    case _ => ()
    }
  }

  // ---- thrift compact protocol internals -------------------------------------------

  test("thrift primitives round-trip: long-form field ids, big lists, bools, maps") {
    val w = new ParquetLite.TWriter
    w.struct(ParquetLite.WStruct(Seq(
      1 -> ParquetLite.WBool(true),
      2 -> ParquetLite.WBool(false),
      3 -> ParquetLite.WI32(-42),
      20 -> ParquetLite.WI64(Long.MaxValue), // delta 17 > 15: long-form header
      21 -> ParquetLite.WI64(Long.MinValue),
      22 -> ParquetLite.WBin("naïve…"),
      23 -> ParquetLite.WList(5, (0 until 20).map(ParquetLite.WI32(_))), // size 20 > 14
      24 -> ParquetLite.WStruct(Seq(1 -> ParquetLite.WBin("nested"))))))
    val b = w.toByteArray
    val r = new ParquetLite.TReader("t", b, 0, b.length)
    val s = r.readStruct()
    r.pos shouldBe b.length
    s.fields(1) shouldBe ParquetLite.TBool(true)
    s.fields(2) shouldBe ParquetLite.TBool(false)
    s.int(3) shouldBe Some(-42L)
    s.int(20) shouldBe Some(Long.MaxValue)
    s.int(21) shouldBe Some(Long.MinValue)
    s.str(22) shouldBe Some("naïve…")
    s.list(23).get.size shouldBe 20
    s.list(23).get(7) shouldBe ParquetLite.TInt(7L)
    s.struct(24).get.str(1) shouldBe Some("nested")
  }

  test("loud failures: short file, bad magic, encrypted magic, footer overrun, " +
      "truncated thrift") {
    def loud(b: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException] { ParquetLite.parseFooter("t", b) }
      e.getMessage should include(why)
    }
    loud(Array[Byte](1, 2, 3), "shorter than the 12-byte minimum")
    loud("XXXXYYYYYYYY".getBytes(UTF_8), "bad leading magic")
    loud("PARE12345678PAR1".getBytes(UTF_8), "encrypted-footer magic")
    loud("PAR112345678PARE".getBytes(UTF_8), "encrypted-footer magic")
    loud("PAR11234PARX".getBytes(UTF_8), "bad trailing magic")
    // valid magic, footer length pointing past the file start
    val over = "PAR1".getBytes(UTF_8) ++ Array[Byte](0, 0) ++
      Array[Byte](-1, -1, -1, 127) ++ "PAR1".getBytes(UTF_8)
    loud(over, "crosses the file start")
    // valid frame, but the thrift bytes are a truncated varint
    val body = Array[Byte](0x16, 0x80.toByte) // field 1 i64, unterminated varint
    val bad = "PAR1".getBytes(UTF_8) ++ body ++
      Array[Byte](body.length.toByte, 0, 0, 0) ++ "PAR1".getBytes(UTF_8)
    loud(bad, "thrift walk truncated") // unterminated varint hits the buffer end
    // a real file with one flipped trailing-magic byte
    val ok = ParquetLite.write(Seq(1L -> "a".getBytes(UTF_8)))
    val flip = ok.clone(); flip(flip.length - 1) = 'X'
    loud(flip, "bad trailing magic")
  }

  test("fuzz: 30 seeded row sets round-trip writer -> spark -> values") {
    val dir = tmp()
    val rnd = new scala.util.Random(1309L)
    for (k <- 0 until 30) {
      val n = 1 + rnd.nextInt(300)
      val in = (0 until n).map(i =>
        (rnd.nextLong().abs, rnd.alphanumeric.take(rnd.nextInt(60)).mkString))
        .sortBy(_._1).distinct
      val bytes = ParquetLite.write(in.map { case (id, t) => id -> t.getBytes(UTF_8) })
      val p = Paths.get(dir, s"f$k.parquet")
      Files.write(p, bytes)
      val m = ParquetLite.parseFooter(s"f$k", bytes)
      m.numRows shouldBe in.size.toLong
      m.groups.head.chunks.find(_.path == "doc_id").get.minLong shouldBe
        Some(in.map(_._1).min)
      spark.read.parquet(p.toString).as[(Long, String)]
        .collect().sortBy(_._1) shouldBe in
    }
  }
}
