package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.ingest.Pipeline
import java.nio.file.Files

/** Columnar replay-log sources: the envelope log archived as ORC/parquet
  * must replay to the identical state as the original JSON fixture.
  */
class FixturesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def stateShape(st: graft.graph.GraphOps.State) = (
    st.assets.collect().map(_.getAs[String]("id")).toSet,
    st.teams.collect().map(_.getAs[String]("identifier")).toSet,
    st.owns.count(), st.parentOf.count())

  test("ORC and parquet envelope logs replay identically to the JSON fixture") {
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    val json = Fixtures.loadJson(spark, path)
    val expected = stateShape(Pipeline.replay(spark, json))

    val orcDir = Files.createTempDirectory("graft_orc").toString + "/log"
    Fixtures.saveOrc(json, orcDir)
    stateShape(Pipeline.replay(spark, Fixtures.loadOrc(spark, orcDir))) shouldBe expected

    val pqDir = Files.createTempDirectory("graft_pq").toString + "/log"
    Fixtures.saveParquet(json, pqDir)
    stateShape(Pipeline.replay(spark, Fixtures.loadParquet(spark, pqDir))) shouldBe expected
  }

  test("Avro OCF envelope log round-trips unions (tombstones) through the hand-rolled walk") {
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    val json = Fixtures.loadJson(spark, path)
    val expected = stateShape(Pipeline.replay(spark, json))

    val avroDir = Files.createTempDirectory("graft_avro").toString + "/log"
    Fixtures.saveAvro(json, avroDir)
    val back = Fixtures.loadAvro(spark, avroDir)
    back.schema shouldBe Fixtures.fixtureSchema
    // a Kafka tombstone is the ["null","string"] union's null branch —
    // it must survive the library-encode / hand-decode round trip
    back.filter("value IS NULL").count() shouldBe json.filter("value IS NULL").count()
    // full row-level equality, not just the folded state
    val k = org.apache.spark.sql.functions.col("offset")
    back.orderBy(k).collect() shouldBe json.orderBy(k).collect()
    stateShape(Pipeline.replay(spark, back)) shouldBe expected
  }

  test("Avro loader rejects a container whose writer schema differs from the fixture schema") {
    // build a part file with key/value REORDERED (both [null,string] unions,
    // so a positional decode would silently swap the columns)
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val swapped = new ASchema.Parser().parse(
      Fixtures.avroSchemaJson
        .replace("""{"name":"key","type":["null","string"]},{"name":"value","type":["null","string"]}""",
          """{"name":"value","type":["null","string"]},{"name":"key","type":["null","string"]}"""))
    swapped.getFields.get(1).name() shouldBe "value" // the replace really swapped
    val dir = Files.createTempDirectory("graft_avro_bad").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](swapped))
    w.create(swapped, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(swapped)
    rec.put("offset", java.lang.Long.valueOf(1L))
    rec.put("key", "k"); rec.put("value", "v"); rec.put("metadata", null)
    w.append(rec); w.close()

    val e = intercept[Exception] {
      Fixtures.loadAvro(spark, dir.toString).collect()
    }
    // the executor-side failure may arrive wrapped in a SparkException
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    msgs should include("does not match the fixture envelope")
  }

  test("CSV envelope log round-trips nested metadata and null tombstones") {
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    val json = Fixtures.loadJson(spark, path)
    val expected = stateShape(Pipeline.replay(spark, json))

    val csvDir = Files.createTempDirectory("graft_csv").toString + "/log"
    Fixtures.saveCsv(json, csvDir)
    val back = Fixtures.loadCsv(spark, csvDir)
    back.schema shouldBe Fixtures.fixtureSchema // same contract as every loader
    // tombstones (value IS NULL) must survive the flat format — CSV's
    // default null handling would conflate them with empty strings
    back.filter("value IS NULL").count() shouldBe json.filter("value IS NULL").count()
    stateShape(Pipeline.replay(spark, back)) shouldBe expected
  }
}
