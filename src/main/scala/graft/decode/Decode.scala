package graft.decode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Stateless decode stage: envelope → validated asset event rows.
  *
  * Implements SURVEY.md §2.B as declarative column expressions — no UDFs,
  * every op stays inside whole-stage codegen and Catalyst can push the
  * derived predicates into the source scan.
  *
  * Reference semantics: vulcan/vulcan.go:86-180.
  */
object Decode {

  // --- B1: header → column projection (reference: vulcan/vulcan.go:136-156)

  /** Lift the `metadata ARRAY<STRUCT<key,value>>` headers into a map and
    * project the required entries. Rows missing any of version/type/
    * identifier are invalid (the reference rejects them).
    */
  def withMetadata(env: DataFrame): DataFrame = {
    val m = map_from_entries(col("metadata"))
    env
      .withColumn("version", element_at(m, "version"))
      .withColumn("asset_type", element_at(m, "type"))
      .withColumn("identifier", element_at(m, "identifier"))
  }

  /** Predicate: all three required headers present. */
  val metadataComplete: Column =
    col("version").isNotNull && col("asset_type").isNotNull &&
      col("identifier").isNotNull

  // --- B2: semver gate (reference: vulcan/vulcan.go:160-180) ---------------

  /** Supported payload version: optional leading 'v', >= 3 dot-separated
    * parts, numeric major == 0. Pure column expressions (no UDF).
    */
  def supportedVersion(version: Column): Column = {
    val major = regexp_extract(version, "^v?(\\d+)\\.", 1)
    (major =!= "") && (major.cast("int") === 0) &&
      (size(split(version, "\\.")) >= 3)
  }

  // --- B3: JSON payload decode (reference: vulcan/vulcan.go:104-107) -------

  /** Decode the JSON payload with the fixed schema. PERMISSIVE from_json
    * yields an all-null struct (NOT a null struct) for malformed JSON, so
    * malformed-ness is detected via a corrupt-record field in one parse:
    * `json_ok` is false iff the value was present but unparseable. `strict`
    * mode callers assert the quarantine set is empty (the reference halts
    * the stream — SURVEY.md §7.4).
    */
  private val corruptField = "_corrupt_record"
  private val payloadSchemaWithCorrupt =
    Schemas.assetPayloadSchema.add(corruptField, org.apache.spark.sql.types.StringType)

  def withPayload(env: DataFrame): DataFrame =
    env
      .withColumn("payload", from_json(col("value"), payloadSchemaWithCorrupt,
        Map("columnNameOfCorruptRecord" -> corruptField)))
      .withColumn("json_ok",
        col("value").isNull || col("payload").getField(corruptField).isNull)

  // --- B4: message-key parse (reference: vulcan/vulcan.go:127-133) ---------

  /** `"<teamID>/<assetID>"` → (team_id, asset_id); exactly two segments.
    * `get()` (not `getItem`) tolerates short arrays under ANSI mode —
    * `getItem(1)` on a slash-less key throws INVALID_ARRAY_INDEX.
    */
  def withParsedKey(env: DataFrame): DataFrame = {
    val parts = split(col("key"), "/")
    env
      .withColumn("key_valid", size(parts) === 2)
      .withColumn("team_id", get(parts, lit(0)))
      .withColumn("asset_id", get(parts, lit(1)))
  }

  // --- B5: tombstone branch (reference: vulcan/vulcan.go:99-119) -----------

  /** Tombstone = null value; payload synthesized from key + headers. */
  def withTombstoneFlag(env: DataFrame): DataFrame =
    env.withColumn("is_nil", col("value").isNull)

  /** Full decode pipeline: headers, version gate, key parse, tombstone flag,
    * payload decode. `valid` marks rows the reference would process;
    * callers split on it (quarantine vs pipeline).
    */
  def decode(env: DataFrame): DataFrame = {
    val staged = withTombstoneFlag(withParsedKey(withPayload(withMetadata(env))))
    // coalesce: a NULL key (or any null-propagating input) must read as
    // INVALID, not NULL — a three-valued `valid` would slip through BOTH
    // `filter(valid)` and the strict-mode `filter(!valid)` quarantine
    // count, silently dropping the row instead of rejecting it
    staged.withColumn(
      "valid",
      coalesce(
        metadataComplete && supportedVersion(col("version")) && col("key_valid") &&
          (col("is_nil") || col("json_ok")),
        lit(false)))
  }
}
