package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.state.Merge.MergeCols

/** The four snapshot-table upserts (SURVEY.md §2.C2-C5), each a single
  * set-at-a-time MERGE per micro-batch.
  *
  * Identity: vertices/edges get deterministic natural-key ids
  * (`type/identifier`, `parent~child`, `team~asset`) instead of the
  * server-assigned UUIDs of the reference — referentially identical, and
  * deterministic replay-safe (at-least-once ⇒ idempotent).
  */
object Upserts {

  /** Deterministic asset vertex id. */
  def assetId(tpe: Column, identifier: Column): Column =
    concat_ws("/", tpe, identifier)

  /** C2 — asset upsert (reference: main.go:145-167, inventory_test.go:376-425).
    *
    * `updates`: (type, identifier, first_seen, last_seen, expiration),
    * unique per (type, identifier) — callers applying a multi-event batch
    * pre-aggregate min/max event times per key.
    * Matched: first_seen kept (min), last_seen advanced (max), expiration
    * replaced. Not matched: insert as given.
    */
  def upsertAssets(assets: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .withColumn("id", assetId(col("type"), col("identifier")))
      .select("id", "type", "identifier", "first_seen", "last_seen", "expiration")
    Merge.merge(assets, u, Seq("type", "identifier"), Map(
      "id" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      "first_seen" -> ((c: MergeCols) => least(c.existing, c.update)),
      "last_seen" -> ((c: MergeCols) => greatest(c.existing, c.update)),
      "expiration" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
  }

  /** C3 — team upsert keyed on identifier; update refreshes the name
    * (reference: main.go:171-195). `updates`: (identifier, name) unique
    * per identifier.
    */
  def upsertTeams(teams: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates.withColumn("id", col("identifier")).select("id", "identifier", "name")
    Merge.merge(teams, u, Seq("identifier"), Map(
      "id" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      "name" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
  }

  /** C4 — owns-edge upsert preserving the ORIGINAL start_time when an edge
    * for (asset, team) already exists — even an ended one — and re-activating
    * it (end_time := update's end_time, null = active).
    * Reference: main.go:199-218 (setOwner), inventory.go:632-674 (PUT).
    *
    * `updates`: (team_id, asset_id, start_time, end_time) unique per
    * (team_id, asset_id).
    */
  def upsertOwns(owns: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .withColumn("id", concat_ws("~", col("team_id"), col("asset_id")))
      .select("id", "team_id", "asset_id", "start_time", "end_time")
    Merge.merge(owns, u, Seq("team_id", "asset_id"), Map(
      "id" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      "start_time" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      // PUT replace: matched rows take the update's end_time VALUE even
      // when it is null (re-activation); untouched rows keep theirs.
      "end_time" -> ((c: MergeCols) =>
        when(c.matched, c.update).otherwise(coalesce(c.existing, c.update)))))
  }

  /** Expire a set of owns edges: end_time := per-row expire time,
    * start_time preserved (reference: main.go:306-317).
    * `toExpire`: (team_id, asset_id, ts) — ts is that tombstone's
    * processing time.
    *
    * UPDATE-ONLY: a tombstone whose (team, asset) owns edge doesn't exist
    * must be a no-op — the reference only iterates EXISTING owner edges
    * (main.go:306-317). An insert here would create a phantom row with
    * null start/end_time, i.e. a phantom ACTIVE edge that flips the C7
    * quantifier and wrongly keeps the asset alive.
    */
  def expireOwns(owns: DataFrame, toExpire: DataFrame): DataFrame = {
    val u = toExpire.select(col("team_id"), col("asset_id"),
      col("ts").as("end_time"))
    Merge.mergeUpdateOnly(owns, u, Seq("team_id", "asset_id"), Map(
      "end_time" -> ((c: MergeCols) => when(c.matched, c.update).otherwise(c.existing))))
  }

  /** Back-compat form: expire all `toExpire` (team_id, asset_id) edges at
    * one instant.
    */
  def expireOwns(owns: DataFrame, toExpire: DataFrame, now: Column): DataFrame =
    expireOwns(owns, toExpire.withColumn("ts", now))

  /** C5 — parent_of edge upsert: first_seen kept / last_seen advanced,
    * expiration replaced (reference: main.go:223-243, inventory.go:528-570,
    * inventory_test.go:578-647).
    *
    * `updates`: (parent_id, child_id, first_seen, last_seen, expiration)
    * unique per (parent_id, child_id) — pre-aggregated like
    * [[upsertAssets]].
    */
  def upsertParentOf(parentOf: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .withColumn("id", concat_ws("~", col("parent_id"), col("child_id")))
      .select("id", "parent_id", "child_id", "first_seen", "last_seen", "expiration")
    Merge.merge(parentOf, u, Seq("parent_id", "child_id"), Map(
      "id" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      "first_seen" -> ((c: MergeCols) => least(c.existing, c.update)),
      "last_seen" -> ((c: MergeCols) => greatest(c.existing, c.update)),
      "expiration" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
  }
}
