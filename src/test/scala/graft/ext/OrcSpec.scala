package graft.ext

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

// The REAL orc-core (the reader Spark itself uses) — the independent
// implementation the hand-rolled walk is cross-validated against.
// Test-only; main code only uses its WRITER (the query's independent
// writer half).
import org.apache.hadoop.fs.Path
import org.apache.orc.{IntegerColumnStatistics, OrcFile, StringColumnStatistics}

/** The ORC PostScript/Footer walk (OrcLite): Spark-written files under
  * every compression kind parse field-for-field equal to
  * `OrcFile.createReader`; the orc-core-written query files round-trip;
  * nested type trees render byte-equal to `TypeDescription.toString`;
  * structural damage fails loudly.
  */
class OrcSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-orc").toString

  private def onePartFile(dir: String): java.nio.file.Path = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".orc"))
    part.length shouldBe 1
    part.head.toPath
  }

  private def realReader(p: java.nio.file.Path) =
    OrcFile.createReader(new Path(p.toString),
      OrcFile.readerOptions(spark.sparkContext.hadoopConfiguration))

  private def sampleDf = {
    val rows = (0 until 700).map { i =>
      (i * 3L, s"text-$i-" + ("q" * (i % 19)), Seq("en", "de", "fr")(i % 3))
    }
    rows.toDF("id", "text", "lang")
  }

  for (codec <- Seq("zlib", "snappy", "zstd", "none")) {
    test(s"spark-written ORC ($codec) parses field-for-field equal to orc-core") {
      val dir = tmp() + s"/$codec"
      sampleDf.coalesce(1).write.option("compression", codec).orc(dir)
      val p = onePartFile(dir)
      val ours = OrcLite.parseFooter(codec, Files.readAllBytes(p))
      val real = realReader(p)
      try {
        ours.numberOfRows shouldBe real.getNumberOfRows
        ours.compression shouldBe real.getCompressionKind.name
        OrcLite.renderType(codec, ours.types) shouldBe real.getSchema.toString
        val stripes = real.getStripes
        ours.stripes.size shouldBe stripes.size
        ours.stripes.zipWithIndex.foreach { case (s, i) =>
          s.offset shouldBe stripes.get(i).getOffset
          s.dataLength shouldBe stripes.get(i).getDataLength
          s.numberOfRows shouldBe stripes.get(i).getNumberOfRows
        }
        val realStats = real.getStatistics
        ours.stats.size shouldBe realStats.length
        // column 1 = id (bigint), column 3 = lang (string)
        val ints = ours.stats(1).ints.get
        val ri = realStats(1).asInstanceOf[IntegerColumnStatistics]
        ints.min.get shouldBe ri.getMinimum
        ints.max.get shouldBe ri.getMaximum
        ints.sum.get shouldBe ri.getSum
        ours.stats(1).numberOfValues.get shouldBe realStats(1).getNumberOfValues
        ours.stats(1).hasNull.get shouldBe realStats(1).hasNull
        val strs = ours.stats(3).strs.get
        val rs = realStats(3).asInstanceOf[StringColumnStatistics]
        strs.min.get shouldBe rs.getMinimum
        strs.max.get shouldBe rs.getMaximum
      } finally real.close()
    }
  }

  test("nested type tree (array/map/struct/decimal) renders byte-equal to orc-core") {
    val dir = tmp() + "/nested"
    spark.sql(
      """SELECT 1L AS id, array(1, 2) AS xs, map('k', 0.5D) AS kv,
        |  named_struct('a', 'x', 'b', CAST(1.25 AS DECIMAL(10,2))) AS st,
        |  CAST(NULL AS TIMESTAMP) AS ts, CAST('2020-01-01' AS DATE) AS d,
        |  true AS flag, CAST(7 AS SMALLINT) AS sm, 0.5F AS f,
        |  CAST('ab' AS BINARY) AS bin""".stripMargin)
      .coalesce(1).write.orc(dir)
    val p = onePartFile(dir)
    val ours = OrcLite.parseFooter("nested", Files.readAllBytes(p))
    val real = realReader(p)
    try OrcLite.renderType("nested", ours.types) shouldBe real.getSchema.toString
    finally real.close()
  }

  test("the query's orc-core writer round-trips through the walk") {
    val docs = (0 until 321).map(i => (100L + i, s"body $i", Seq("sv", "fi")(i % 2)))
    val bytes = OrcLite.writeViaOrcCore(docs, "ZLIB")
    val m = OrcLite.parseFooter("mr", bytes)
    m.numberOfRows shouldBe 321L
    m.compression shouldBe "ZLIB"
    m.stripes.size shouldBe 1
    m.types.size shouldBe 4
    val ints = m.stats(1).ints.get
    ints.min.get shouldBe 100L
    ints.max.get shouldBe 420L
    ints.sum.get shouldBe docs.map(_._1).sum
    m.stats(1).hasNull.get shouldBe false
    val strs = m.stats(3).strs.get
    strs.min.get shouldBe "fi"
    strs.max.get shouldBe "sv"
    m.stats(3).numberOfValues.get shouldBe 321L
  }

  test("SNAPPY-framed footers decode through the hand-rolled snappy") {
    // small footers ride as isOriginal chunks; force a compressible
    // footer with many columns so the codec actually engages
    val dir = tmp() + "/wide"
    val cols = (0 until 120).map(i => s"CAST($i AS BIGINT) AS col_with_a_long_name_$i")
    spark.sql(s"SELECT ${cols.mkString(", ")}")
      .coalesce(1).write.option("compression", "snappy").orc(dir)
    val p = onePartFile(dir)
    val ours = OrcLite.parseFooter("wide", Files.readAllBytes(p))
    ours.compression shouldBe "SNAPPY"
    ours.types.size shouldBe 121
    val real = realReader(p)
    try OrcLite.renderType("wide", ours.types) shouldBe real.getSchema.toString
    finally real.close()
  }

  test("structural damage fails loudly with the byte offset") {
    val bytes = OrcLite.writeViaOrcCore(Seq((1L, "a", "en")), "ZLIB")
    def boom(mut: Array[Byte] => Unit): String = {
      val b = bytes.clone()
      mut(b)
      intercept[IllegalArgumentException](OrcLite.parseFooter("dmg", b)).getMessage
    }
    boom(b => b(0) = 'X') should include("bad leading magic")
    boom(b => b(b.length - 1) = 0) should include("crosses the file start")
    // PostScript magic byte damage (the trailing ORC string)
    boom { b =>
      val psLen = b(b.length - 1) & 0xff
      b(b.length - 2) = 'X' // last magic byte inside the PostScript
      val _ = psLen
    } should (include("magic") or include("parse"))
    intercept[IllegalArgumentException](
      OrcLite.parseFooter("short", Array[Byte](1, 2, 3))).getMessage should
      include("16-byte minimum")
  }

  test("orcDecompress: chunk framing damage fails loudly") {
    intercept[IllegalArgumentException](
      OrcLite.orcDecompress("t", Array[Byte](1, 0), 0, 2, "ZLIB")
    ).getMessage should include("chunk header truncated")
    // declared chunk length crossing the end
    intercept[IllegalArgumentException](
      OrcLite.orcDecompress("t", Array[Byte](40, 0, 0, 1), 0, 4, "ZLIB")
    ).getMessage should include("crosses the stream end")
  }
}
