package graft.schema

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Data model of the asset-event pipeline, re-expressed for Spark.
  *
  * Mirrors the reference's three model layers (see SURVEY.md §1):
  *  - stream envelope (reference: stream/stream.go:8-18)
  *  - asset event payload (reference: vulcan/vulcan.go:30-66)
  *  - temporal-property-graph snapshot tables
  *    (reference: inventory/inventory.go:45-120)
  *
  * Schemas are explicit `StructType`s — never inferred — matching the
  * reference's compile-time struct tags. Case classes give typed
  * `Dataset[T]` views at API boundaries.
  */
object Schemas {

  // --- stream envelope -----------------------------------------------------

  /** Kafka-style header entry (reference: stream/stream.go:15-18). */
  case class MetadataEntry(key: String, value: String)

  /** Keyed message envelope. `value == null` is a tombstone (deletion
    * event) — reference: vulcan/vulcan.go:104-119.
    */
  case class Envelope(key: String, value: String, metadata: Seq[MetadataEntry])

  val metadataEntryType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("metadata", ArrayType(metadataEntryType))))

  // --- event payload -------------------------------------------------------

  case class Team(Id: String, Name: String, Description: String, Tag: String)
  case class Annotation(Key: String, Value: String)

  /** Asset change-event payload (reference: vulcan/vulcan.go:30-39). */
  case class AssetPayload(
      Id: String,
      Team: Team,
      Alias: String,
      Rolfp: String,
      Scannable: Boolean,
      AssetType: String,
      Identifier: String,
      Annotations: Seq[Annotation])

  val teamType: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("Name", StringType),
    StructField("Description", StringType),
    StructField("Tag", StringType)))

  val annotationType: StructType = StructType(Seq(
    StructField("Key", StringType),
    StructField("Value", StringType)))

  val assetPayloadSchema: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("Team", teamType),
    StructField("Alias", StringType),
    StructField("Rolfp", StringType),
    StructField("Scannable", BooleanType),
    StructField("AssetType", StringType),
    StructField("Identifier", StringType),
    StructField("Annotations", ArrayType(annotationType))))

  // --- snapshot tables (the engine's state) --------------------------------

  /** "Still alive" sentinel (reference: inventory/inventory.go:29-32). */
  val UnexpiredLiteral = "9999-12-12 23:59:59"
  val Unexpired: Timestamp = Timestamp.valueOf(UnexpiredLiteral)

  /** Asset vertex (reference: inventory/inventory.go:71-78). */
  case class Asset(
      id: String,
      `type`: String,
      identifier: String,
      first_seen: Timestamp,
      last_seen: Timestamp,
      expiration: Timestamp)

  /** Team vertex (reference: inventory/inventory.go:54-58). */
  case class TeamRow(id: String, identifier: String, name: String)

  /** parent_of edge (reference: inventory/inventory.go:89-96). */
  case class ParentOf(
      id: String,
      parent_id: String,
      child_id: String,
      first_seen: Timestamp,
      last_seen: Timestamp,
      expiration: Timestamp)

  /** owns edge; active iff `end_time == null`
    * (reference: inventory/inventory.go:107-113, main.go:306-311).
    */
  case class Owns(
      id: String,
      team_id: String,
      asset_id: String,
      start_time: Timestamp,
      end_time: Option[Timestamp])

  val assetSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("identifier", StringType),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType),
    StructField("expiration", TimestampType)))

  val teamSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("identifier", StringType),
    StructField("name", StringType)))

  val parentOfSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("parent_id", StringType),
    StructField("child_id", StringType),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType),
    StructField("expiration", TimestampType)))

  val ownsSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("team_id", StringType),
    StructField("asset_id", StringType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType)))
}
