package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic set-at-a-time MERGE for plain-parquet snapshot tables.
  *
  * The reference performs insert-or-update per record over HTTP (the N+1
  * pattern its own TODO bemoans — cmd/graph-vulcan-assets/main.go:19-20).
  * Here a whole micro-batch merges in ONE full-outer join per table:
  *
  *   target FULL OUTER JOIN updates ON keys
  *     matched      → per-column resolution expression
  *     not matched  → insert from update row
  *     target-only  → carried unchanged
  *
  * Scale notes (100 TB design):
  *  - the join shuffles both sides on the merge keys; snapshots persisted
  *    pre-partitioned on those keys avoid re-shuffling the big side.
  *  - the updates side of a micro-batch is small → Spark's AQE picks a
  *    broadcast/shuffled-hash join automatically; callers may also pass an
  *    explicitly `broadcast()`ed updates frame.
  *  - updates MUST be unique per key (compact first — see
  *    [[graft.temporal.Temporal.lastWriterPerKey]]); a duplicate-key guard
  *    is available as [[Merge.duplicateKeys]].
  */
object Merge {

  /** Column resolution context for one output column of a merge. */
  final case class MergeCols(existing: Column, update: Column, matched: Column)

  /** MERGE `updates` into `target` on `keys`.
    *
    * @param resolve per non-key output column name, the resolution
    *                expression. Defaults (when absent from the map):
    *                matched → keep existing; not matched → take update.
    * @param insertUnmatched when true (default), update rows with no
    *                matching target row are INSERTED; when false the merge
    *                is update-only — unmatched update rows are dropped
    *                (e.g. expiring an edge that doesn't exist is a no-op,
    *                reference main.go:306-317). Update-only uses a LEFT
    *                OUTER join (cheaper than full-outer: the updates side
    *                never expands the output).
    */
  def merge(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      resolve: Map[String, MergeCols => Column] = Map.empty,
      insertUnmatched: Boolean = true): DataFrame = {
    // a typo'd resolver name would otherwise be silently ignored and the
    // column fall back to default resolution — corrupting state no-error
    require(resolve.keySet.subsetOf(target.columns.toSet),
      s"resolver(s) for non-existent column(s): ${resolve.keySet.diff(target.columns.toSet).mkString(", ")}")
    val t = target.alias("t")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    // `matched` must distinguish "row exists on this side" even when all
    // payload columns are null → join on a non-null marker column.
    val tm = t.withColumn("__t_present", lit(true)).alias("t")
    val um = u.withColumn("__u_present", lit(true)).alias("u")
    val joined =
      if (insertUnmatched) tm.join(um, cond, "full_outer")
      else tm.join(um, cond, "left_outer")
    val matched = col("t.__t_present").isNotNull && col("u.__u_present").isNotNull
    val updateOnly = col("t.__t_present").isNull

    val keyCols = keys.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k))
    val otherCols = target.columns.filterNot(keys.contains).map { c =>
      val ctx = MergeCols(col(s"t.$c"), if (updates.columns.contains(c)) col(s"u.$c") else lit(null), matched)
      resolve.get(c) match {
        case Some(f) => f(ctx).as(c)
        case None =>
          // default: insert takes update value, match keeps existing
          when(updateOnly, ctx.update).otherwise(ctx.existing).as(c)
      }
    }
    joined.select(keyCols ++ otherCols: _*)
  }

  /** Update-only MERGE: unmatched update rows are silently dropped. */
  def mergeUpdateOnly(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      resolve: Map[String, MergeCols => Column] = Map.empty): DataFrame =
    merge(target, updates, keys, resolve, insertUnmatched = false)

  /** C6 duplicate-key guard: keys appearing more than once in `df`.
    * The reference hard-errors on >1 match (main.go:151-166); callers
    * assert this is empty before merging.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
}
