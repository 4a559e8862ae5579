package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** H89 — Delta Lake transaction-log snapshot reconstruction: checkpoint
  * + JSON commit replay with latest-action-wins, the protocol reader
  * gate, and loud failures on a broken log.
  */
class DeltaLogSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(): String = {
    val d = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_deltaspec_${java.util.UUID.randomUUID()}"
    d
  }

  private def buildAt(dir: String): Unit =
    DeltaLog.buildTable(spark, Tables.documents(spark, "/root/testdata/sf0.001"), dir)

  test("snapshot replay: latest action wins, re-added file is live again") {
    val dir = freshDir()
    buildAt(dir)
    val (version, live) = DeltaLog.snapshot(spark, dir)
    version shouldBe 3L
    val paths = live.collect().map(_.getString(0)).sorted
    // fids 0..9 at sf0.001: removed v2 = {1,6}, removed v3 = {3,8}, re-added v3 = {1}
    val expected = (0L to 9L).filter(f => (f % 5 != 1 && f % 5 != 3) || f % 10 == 1)
      .map(f => f"part-$f%05d.parquet")
    paths shouldBe expected.toArray
    // file 1: add(v0/v1) → remove(v2) → add(v3) — live by latest-wins
    paths should contain("part-00001.parquet")
    // file 6: removed at v2, never re-added
    paths should not contain "part-00006.parquet"
  }

  test("snapshot from the checkpoint alone (no later commits) is the v2 state") {
    val dir = freshDir()
    buildAt(dir)
    Files.delete(Paths.get(dir, "_delta_log", f"${3L}%020d.json"))
    val (version, live) = DeltaLog.snapshot(spark, dir)
    version shouldBe 2L
    val paths = live.collect().map(_.getString(0)).sorted
    val expected = (0L to 9L).filter(_ % 5 != 1).map(f => f"part-$f%05d.parquet")
    paths shouldBe expected.toArray
  }

  test("data files written by our parquet writer read back through spark.read") {
    val dir = freshDir()
    buildAt(dir)
    val df = spark.read.parquet(s"$dir/part-00000.parquet")
    df.columns.sorted shouldBe Array("doc_id", "text")
    df.count() shouldBe 50L
  }

  test("protocol gate: minReaderVersion above ours is refused loudly") {
    val dir = freshDir()
    buildAt(dir)
    // append a v4 commit raising the reader requirement
    Files.write(Paths.get(dir, "_delta_log", f"${4L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""".getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, dir))
    e.getMessage should include("minReaderVersion 3")
  }

  test("a broken log fails loudly: missing _last_checkpoint, missing checkpoint file") {
    val dir = freshDir()
    buildAt(dir)
    val cp = Paths.get(dir, "_delta_log", f"${2L}%020d.checkpoint.parquet")
    Files.delete(cp)
    val e1 = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, dir))
    e1.getMessage should include("is missing")
    Files.delete(Paths.get(dir, "_delta_log", "_last_checkpoint"))
    val e2 = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, dir))
    e2.getMessage should include("no _last_checkpoint")
  }

  test("q_delta_snapshot is internally consistent at sf0.001") {
    val df = DeltaLog.q_delta_snapshot.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      val rows = df.count()
      rows should be > 0L
      df.filter("version <> 3").count() shouldBe 0L
      // removed files contribute no rows
      df.filter("file_id in (3, 6, 8)").count() shouldBe 0L
      // the re-added file contributes all its rows
      df.filter("file_id = 1").count() shouldBe 50L
    } finally df.unpersist()
  }
}
