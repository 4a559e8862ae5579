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
    * `updates`: (type, identifier, ts TIMESTAMP, expiration TIMESTAMP),
    * unique per (type, identifier).
    * Matched: first_seen kept (min), last_seen advanced (max), expiration
    * replaced. Not matched: insert with first_seen = last_seen = ts.
    */
  def upsertAssets(assets: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .withColumn("id", assetId(col("type"), col("identifier")))
      .withColumn("first_seen", col("ts"))
      .withColumn("last_seen", col("ts"))
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

  /** Expire a set of owns edges: end_time := now, start_time preserved
    * (reference: main.go:306-317). `toExpire`: (team_id, asset_id).
    */
  def expireOwns(owns: DataFrame, toExpire: DataFrame, now: Column): DataFrame = {
    val u = toExpire.select("team_id", "asset_id").withColumn("__expire", lit(true))
    Merge.merge(owns, u, Seq("team_id", "asset_id"), Map(
      "end_time" -> ((c: MergeCols) => when(c.matched, now).otherwise(c.existing))))
  }

  /** C5 — parent_of edge upsert: first_seen kept / last_seen advanced,
    * expiration replaced (reference: main.go:223-243, inventory.go:528-570,
    * inventory_test.go:578-647).
    *
    * `updates`: (parent_id, child_id, ts, expiration) unique per
    * (parent_id, child_id).
    */
  def upsertParentOf(parentOf: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .withColumn("id", concat_ws("~", col("parent_id"), col("child_id")))
      .withColumn("first_seen", col("ts"))
      .withColumn("last_seen", col("ts"))
      .select("id", "parent_id", "child_id", "first_seen", "last_seen", "expiration")
    Merge.merge(parentOf, u, Seq("parent_id", "child_id"), Map(
      "id" -> ((c: MergeCols) => coalesce(c.existing, c.update)),
      "first_seen" -> ((c: MergeCols) => least(c.existing, c.update)),
      "last_seen" -> ((c: MergeCols) => greatest(c.existing, c.update)),
      "expiration" -> ((c: MergeCols) => coalesce(c.update, c.existing))))
  }
}
