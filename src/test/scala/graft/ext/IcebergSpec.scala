package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** H92 — Iceberg metadata-tree walk: version hint → metadata JSON →
  * manifest list (real-Avro-written, hand-rolled-read) → manifests with
  * verified counts → snapshot scan; plus time travel and the loud
  * failure table.
  */
class IcebergSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_icespec_${java.util.UUID.randomUUID()}"

  private def buildAt(dir: String): Unit =
    Iceberg.buildTable(spark, Tables.documents(spark, "/root/testdata/sf0.001"), dir)

  test("current snapshot: deleted-status files pruned, counts verified") {
    val dir = freshDir()
    buildAt(dir)
    val (snapId, nManifests, live) = Iceberg.planScan(dir)
    snapId shouldBe 2L
    nManifests shouldBe 2
    // fids 0..9: live = fid % 4 != 2 → drop 2, 6
    val fids = live.map(_.filePath).sorted.map(p => p.drop("data/part-".length).take(5).toLong)
    fids shouldBe (0L to 9L).filterNot(f => f % 4 == 2).toVector
    live.foreach { e =>
      e.fileFormat shouldBe "PARQUET"
      e.recordCount shouldBe 50L
    }
    // the rewritten manifest keeps snapshot lineage: odd fids were added
    // at snapshot 2, surviving evens at snapshot 1
    live.filter(_.filePath.contains("part-00001")).head.snapshotId shouldBe 2L
    live.filter(_.filePath.contains("part-00000")).head.snapshotId shouldBe 1L
  }

  test("time travel: snapshot 1 is the pre-delete even-files state") {
    val dir = freshDir()
    buildAt(dir)
    val (snapId, nManifests, live) = Iceberg.planScan(dir, Some(1L))
    snapId shouldBe 1L
    nManifests shouldBe 1
    val fids = live.map(_.filePath).sorted.map(p => p.drop("data/part-".length).take(5).toLong)
    fids shouldBe (0L to 9L).filter(_ % 2 == 0).toVector
  }

  test("loud failures: count lie, schema-shape lie, missing files, format version") {
    val dir = freshDir()
    buildAt(dir)
    // count lie: flip one entry's status in a manifest by rewriting the
    // manifest list with wrong declared counts
    val ml = Paths.get(dir, "metadata/snap-2.avro")
    val manifests = Iceberg.readManifestList(0L, Files.readAllBytes(ml))
    manifests.map(_.added).sum should be > 0
    // declared-length lie: truncate a manifest file on disk
    val m2 = Paths.get(dir, "metadata/m2-snap2.avro")
    val m2bytes = Files.readAllBytes(m2)
    Files.write(m2, m2bytes ++ Array[Byte](0))
    val e1 = intercept[IllegalArgumentException](Iceberg.planScan(dir))
    e1.getMessage should include("manifest list declares")
    Files.write(m2, m2bytes) // restore
    // missing manifest
    Files.delete(m2)
    val e2 = intercept[IllegalArgumentException](Iceberg.planScan(dir))
    e2.getMessage should include("is missing")
    Files.write(m2, m2bytes) // restore
    // unknown snapshot id
    val e3 = intercept[IllegalArgumentException](Iceberg.planScan(dir, Some(9L)))
    e3.getMessage should include("snapshot 9 not present")
    // format-version gate
    val meta = Paths.get(dir, "metadata/v2.metadata.json")
    val metaStr = Files.readString(meta, UTF_8)
    Files.write(meta, metaStr.replace("\"format-version\":2", "\"format-version\":3").getBytes(UTF_8))
    val e4 = intercept[IllegalArgumentException](Iceberg.planScan(dir))
    e4.getMessage should include("format-version 3 unsupported")
    Files.write(meta, metaStr.getBytes(UTF_8))
    // missing hint
    Files.delete(Paths.get(dir, "metadata/version-hint.text"))
    val e5 = intercept[IllegalArgumentException](Iceberg.planScan(dir))
    e5.getMessage should include("no version-hint.text")
  }

  test("manifest schema field-order gate refuses a reshuffled writer schema") {
    // an OCF whose record schema has the fields in a different order
    // must be refused, not silently misdecoded
    val wrongSchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"snapshot_id","type":"long"},
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new ASchema.Parser().parse(wrongSchema)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    val df = new GenericData.Record(schema.getField("data_file").schema())
    df.put("file_path", "p"); df.put("file_format", "PARQUET")
    df.put("record_count", 1L); df.put("file_size_in_bytes", 2L)
    val rec = new GenericData.Record(schema)
    rec.put("snapshot_id", 1L); rec.put("status", 1); rec.put("data_file", df)
    w.append(rec); w.close()
    val e = intercept[IllegalArgumentException](Iceberg.readManifest(0L, out.toByteArray))
    e.getMessage should include("do not match the spec shape")
  }

  test("q_iceberg_snapshot is internally consistent at sf0.001") {
    val df = Iceberg.q_iceberg_snapshot.fn(spark, "/root/testdata/sf0.001").cache()
    try {
      df.count() should be > 0L
      df.filter("snapshot_id <> 2 or n_manifests <> 2").count() shouldBe 0L
      df.filter("file_id in (2, 6)").count() shouldBe 0L
      df.filter("file_id = 1").count() shouldBe 50L
    } finally df.unpersist()
  }
}
