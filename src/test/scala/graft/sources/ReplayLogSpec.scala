package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** End-to-end coverage of the `graft-replay` DataSource V2 source: offset
  * assignment, admission control (maxOffsetsPerTrigger), restart from a
  * checkpoint against an appended log, and the downstream envelope decode
  * — the A3/E5/E1 contracts exercised through Spark's own streaming
  * engine rather than a MemoryStream shortcut.
  */
class ReplayLogSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_replay_$tag").toString

  private def writeLog(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), lines.mkString("\n").getBytes("UTF-8"))

  private val fiveLines = (0 until 5).map(i => s"""{"k":"key$i"}""")

  test("batch read emits every line with its line-number offset") {
    val log = tmpDir("batch") + "/log.jsonl"
    writeLog(log, fiveLines)
    val got = spark.read.format("graft-replay").option("path", log).load()
      .orderBy("offset").collect().map(r => (r.getLong(0), r.getString(1)))
    got shouldBe fiveLines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toArray
  }

  test("batch read splits into minPartitions contiguous slices, no loss") {
    val log = tmpDir("split") + "/log.jsonl"
    writeLog(log, (0 until 13).map(i => s"line$i"))
    val df = spark.read.format("graft-replay")
      .option("path", log).option("minPartitions", 4).load()
    df.rdd.getNumPartitions shouldBe 4
    df.select("offset").collect().map(_.getLong(0)).sorted shouldBe (0L until 13L).toArray
  }

  test("maxOffsetsPerTrigger bounds each micro-batch via admission control") {
    val base = tmpDir("rate")
    val log = base + "/log.jsonl"
    writeLog(log, fiveLines)
    val q = spark.readStream.format("graft-replay")
      .option("path", log).option("maxOffsetsPerTrigger", 2).load()
      .writeStream.format("memory").queryName("replay_rate")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      spark.table("replay_rate").count() shouldBe 5
      // 5 rows at <=2 per batch = >=3 non-empty batches
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      sizes.max should be <= 2L
      sizes.sum shouldBe 5L
      sizes.length should be >= 3
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed offset (append-only log)") {
    val base = tmpDir("restart")
    val log = base + "/log.jsonl"
    val out = base + "/out"
    writeLog(log, fiveLines)
    def run(): Unit = {
      val q = spark.readStream.format("graft-replay").option("path", log).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", base + "/ckpt")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // append two lines AFTER the first run committed offset 5
    Files.write(Paths.get(log), "\nextra5\nextra6".getBytes("UTF-8"),
      StandardOpenOption.APPEND)
    run()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // exactly once per offset — no re-emission of the first five
    rows.map(_._1) shouldBe (0L until 7L).toArray
    rows(5)._2 shouldBe "extra5"
    rows(6)._2 shouldBe "extra6"
  }

  test("an empty log reads as zero rows in batch and yields no stream batches") {
    val base = tmpDir("empty")
    val log = base + "/log.jsonl"
    writeLog(log, Seq.empty)
    spark.read.format("graft-replay").option("path", log).load().count() shouldBe 0
    val q = spark.readStream.format("graft-replay").option("path", log).load()
      .writeStream.format("memory").queryName("replay_empty")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      spark.table("replay_empty").count() shouldBe 0
    } finally q.stop()
  }

  test("a missing path or missing log file fails loudly, not as empty data") {
    val e1 = intercept[Exception] {
      spark.read.format("graft-replay").load()
    }
    e1.getMessage should include("path")
    val e2 = intercept[Exception] {
      spark.read.format("graft-replay")
        .option("path", tmpDir("absent") + "/nope.jsonl").load().count()
    }
    (e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase should include("nope.jsonl")
  }

  test("the scan reports the log's real byte size as its statistics") {
    val log = tmpDir("stats") + "/log.jsonl"
    writeLog(log, fiveLines)
    val df = spark.read.format("graft-replay").option("path", log).load()
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong shouldBe
      java.nio.file.Files.size(java.nio.file.Paths.get(log))
  }

  test("the raw value decodes downstream with the fixture envelope schema") {
    val base = tmpDir("decode")
    val fixture = getClass.getResource("/fixtures/valid_assets.json").getPath
    val log = base + "/log.jsonl"
    ReplayLog.toLog(spark, fixture, log)
    val decoded = spark.read.format("graft-replay").option("path", log).load()
      .select(col("offset"),
        from_json(col("value"), graft.schema.Schemas.envelopeSchema).as("env"))
      .select(col("offset"), col("env.key").as("key"), col("env.value").as("value"),
        col("env.metadata").as("metadata"))
    val viaFixture = Fixtures.loadJson(spark, fixture)
      .select("offset", "key", "value", "metadata")
    decoded.count() shouldBe viaFixture.count()
    decoded.exceptAll(viaFixture).count() shouldBe 0
    viaFixture.exceptAll(decoded).count() shouldBe 0
  }
}
