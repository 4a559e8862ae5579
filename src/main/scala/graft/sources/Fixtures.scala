package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.schema.Schemas

/** A3 — fixture-driven mock source (reference:
  * stream/streamtest/streamtest.go:14-82): a JSON-array file of stream
  * envelopes replayable through the batch pipeline or a MemoryStream.
  *
  * Each fixture record carries an explicit `offset` (total input order) —
  * the batch analog of a Kafka partition offset; file order is NOT relied
  * on (a multi-partition read would not preserve it).
  */
object Fixtures {

  /** Envelope + explicit offset. */
  val fixtureSchema: StructType = StructType(
    StructField("offset", LongType) +: Schemas.envelopeSchema.fields.toSeq)

  /** Load a JSON-array fixture file with the fixed envelope schema (never
    * inferred — mirrors the reference's compile-time fixture schema).
    */
  def loadJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(fixtureSchema).option("multiLine", "true").json(path)

  /** Columnar replay-log variants: an archived envelope log (the
    * cold-storage twin of the Kafka topic) saved/loaded as ORC or parquet.
    * Nested metadata survives both; schema is always the fixed envelope
    * schema, never inferred.
    */
  def saveOrc(envelopes: DataFrame, path: String): Unit =
    envelopes.write.mode("overwrite").orc(path)

  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(fixtureSchema).orc(path)

  def saveParquet(envelopes: DataFrame, path: String): Unit =
    envelopes.write.mode("overwrite").parquet(path)

  def loadParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(fixtureSchema).parquet(path)

  /** CSV twin: the flat interchange format for upstreams that can't emit
    * nested columnar logs. The nested metadata array is JSON-encoded into
    * one string column on write and parsed back on read, so the loaded
    * frame carries the same fixed envelope schema as every other loader.
    * An explicit null sentinel keeps tombstones (`value IS NULL`) distinct
    * from empty strings — CSV's default maps both to null on read.
    */
  private val CsvNull = "\\N"

  def saveCsv(envelopes: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    envelopes
      .withColumn("metadata", to_json(col("metadata")))
      .write.mode("overwrite")
      .option("header", "true").option("nullValue", CsvNull)
      .csv(path)
  }

  /** Avro OCF twin — the interchange format the reference's own domain
    * ships (Kafka ecosystems archive topics as Avro container files, and
    * a tombstone is literally the `["null","string"]` union's null
    * branch). The WRITE half goes through the real Avro library
    * (GenericDatumWriter + DataFileWriter, deflate); the READ half is
    * the engine's own byte-level container walk
    * ([[graft.ext.AvroCodec.parseOcfWith]]) with the union/array
    * primitives — so loading a fixture log cross-validates the
    * hand-rolled decode against the library's encode on every replay.
    * One container file per partition under `path`; row order inside a
    * file is NOT relied on (the explicit `offset` column sequences, the
    * same contract as every other loader).
    */
  val avroSchemaJson: String =
    """{"type":"record","name":"FixtureEnvelope","fields":[
      |{"name":"offset","type":"long"},
      |{"name":"key","type":["null","string"]},
      |{"name":"value","type":["null","string"]},
      |{"name":"metadata","type":["null",{"type":"array","items":
      |{"type":"record","name":"MetadataEntry","fields":[
      |{"name":"key","type":["null","string"]},
      |{"name":"value","type":["null","string"]}]}}]}]}""".stripMargin
      .replace("\n", "")

  def saveAvro(envelopes: DataFrame, path: String): Unit = {
    val schemaJson = avroSchemaJson
    // Hadoop-aware like the ORC/parquet/CSV savers: executors resolve the
    // FileSystem from a broadcast configuration instead of java.io.File,
    // so the writer works on any cluster filesystem, not just local mode.
    val sc = envelopes.sparkSession.sparkContext
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    val root = new org.apache.hadoop.fs.Path(path)
    root.getFileSystem(sc.hadoopConfiguration).mkdirs(root)
    envelopes.select("offset", "key", "value", "metadata").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          import org.apache.avro.{Schema => ASchema}
          import org.apache.avro.file.{CodecFactory, DataFileWriter}
          import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
          val schema = new ASchema.Parser().parse(schemaJson)
          val metaSchema = schema.getField("metadata").schema().getTypes.get(1)
          val entrySchema = metaSchema.getElementType
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.setCodec(CodecFactory.deflateCodec(6))
          val part = new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(path), f"part-$pid%05d.avro")
          val os = part.getFileSystem(confBc.value.value).create(part, true)
          w.create(schema, os)
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            rec.put("offset", java.lang.Long.valueOf(row.getLong(0)))
            rec.put("key", if (row.isNullAt(1)) null else row.getString(1))
            rec.put("value", if (row.isNullAt(2)) null else row.getString(2))
            rec.put("metadata",
              if (row.isNullAt(3)) null
              else {
                val list = new java.util.ArrayList[GenericRecord]()
                row.getSeq[org.apache.spark.sql.Row](3).foreach { m =>
                  val e = new GenericData.Record(entrySchema)
                  e.put("key", if (m.isNullAt(0)) null else m.getString(0))
                  e.put("value", if (m.isNullAt(1)) null else m.getString(1))
                  list.add(e)
                }
                list
              })
            w.append(rec)
          }
          w.close()
          Iterator.single(1)
        }
      }.count() // force the write
    ()
  }

  def loadAvro(spark: SparkSession, path: String): DataFrame = {
    import graft.ext.AvroCodec
    import org.apache.spark.sql.Row
    val expectedJson = avroSchemaJson
    val rows = spark.sparkContext.binaryFiles(s"$path/part-*.avro")
      .flatMap { case (file, pds) =>
        val c = AvroCodec.parseOcfWith(0L, pds.toArray()) { r =>
          val offset = r.readVarLong()
          val key = AvroCodec.readOptString(r)
          val value = AvroCodec.readOptString(r)
          val metadata = r.readVarLong() match {
            case 0 => null
            case 1 => AvroCodec.readArray(r)(m =>
              Row(AvroCodec.readOptString(m), AvroCodec.readOptString(m)))
            case i => r.fail(r.pos, s"union branch $i out of range for [null,array]")
          }
          Row(offset, key, value, metadata)
        }
        // The record reader above decodes POSITIONALLY, so the container's
        // embedded writer schema must match the fixture schema structurally
        // (field order included) — a reordered or evolved part file would
        // otherwise decode silently into wrong rows. Avro's Schema equality
        // is exactly that structural comparison (names, order, types; not
        // whitespace/doc).
        val expected = new org.apache.avro.Schema.Parser().parse(expectedJson)
        val actual = new org.apache.avro.Schema.Parser().parse(c.schema)
        if (actual != expected) throw new IllegalArgumentException(
          s"$file: container schema does not match the fixture envelope " +
            s"schema (positional decode would mis-read); found: ${c.schema}")
        c.docs
      }
    spark.createDataFrame(rows, fixtureSchema)
  }

  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val flat = StructType(fixtureSchema.fields.map {
      case f if f.name == "metadata" => f.copy(dataType = StringType)
      case f => f
    })
    spark.read.schema(flat)
      .option("header", "true").option("nullValue", CsvNull)
      .csv(path)
      .withColumn("metadata",
        from_json(col("metadata"), ArrayType(Schemas.metadataEntryType)))
  }
}
