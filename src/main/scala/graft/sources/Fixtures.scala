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
