package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / ordering operators (SURVEY.md §2.D). */
object Temporal {

  /** D1 — pagination. The reference exposes page/size on every list
    * endpoint (inventory/inventory.go:117-120); size == 0 disables.
    *
    * ORDER BY + LIMIT + OFFSET: Spark plans this as a top-K
    * (TakeOrderedAndProject with offset) — each partition keeps only its
    * local top (page+1)*size rows, so nothing like a global sort or a
    * single-partition window ever runs (a `Window.orderBy` with no
    * partitionBy funnels the WHOLE table through one task — the round-1
    * implementation, a scale-killer). Deep pages degrade as O(page*size)
    * per-partition state — for deep scans use key-set pagination:
    * `WHERE key > last_seen ORDER BY key LIMIT size` ([[paginateAfter]]).
    *
    * `orderCols` must be a total order (include a unique key) for
    * deterministic pages.
    */
  def paginate(df: DataFrame, orderCols: Seq[Column], page: Int, size: Int): DataFrame = {
    // size == 0 disables pagination entirely: no page window means order
    // is not contractual either, and skipping the orderBy spares a full
    // global sort of the input (the unpaginated endpoint calls at scale)
    if (size == 0) df
    else df.orderBy(orderCols: _*).offset(page * size).limit(size)
  }

  /** D1 (scale path) — key-set pagination: the page after `lastSeen` in
    * `keyCol` order. O(size) regardless of depth; the predicate pushes
    * into the scan.
    */
  def paginateAfter(df: DataFrame, keyCol: Column, lastSeen: Column, size: Int): DataFrame =
    df.filter(keyCol > lastSeen).orderBy(keyCol).limit(size)

  /** D2 — valid-at (as-of) temporal predicate: alive at instant `at`.
    * Reference: inventory/inventory.go:173-193 (`valid_at` query param);
    * semantics proven by inventory_test.go:291-298 (first_seen <= T <
    * expiration).
    */
  def validAt(first_seen: Column, expiration: Column, at: Column): Column =
    first_seen <= at && expiration > at

  /** D3 — per-key last-writer-wins compaction of an event batch: keep each
    * key's latest event by `seq` (Kafka offset). Recovers the per-partition
    * ordering guarantee the reference relies on (stream/kafka/kafka.go:76)
    * inside a set-oriented micro-batch.
    *
    * Uses max_by-style aggregation (single shuffle, partial aggregation
    * map-side) rather than a window sort — cheaper at scale.
    *
    * PRECONDITION: `seq` must be strictly unique per key (Kafka offsets
    * are). On a tie max_by picks an arbitrary whole row — deterministic
    * in neither run-to-run nor against per-column-max_by oracles.
    */
  def lastWriterPerKey(df: DataFrame, key: Seq[String], seq: String): DataFrame = {
    val payload = struct(df.columns.filterNot(key.contains).map(col): _*)
    df.groupBy(key.map(col): _*)
      .agg(max_by(payload, col(seq)).as("__last"))
      .select(key.map(col) ++
        df.columns.filterNot(key.contains).map(c => col(s"__last.$c").as(c)): _*)
  }

  /** D3 compacted variant — tombstone-segment epochs. Per-key ordering only
    * matters around tombstones: a run of refreshes for one key with no
    * tombstone in between can be applied in a single set-at-a-time batch
    * (the upserts aggregate per key). So the epoch number is:
    *
    *   refresh in segment k (k tombstones before it) → epoch 2k+1
    *   (k+1)-th tombstone                            → epoch 2k+2
    *
    * Max epoch = 2 * max-tombstones-per-key + 1 — O(1) for realistic
    * streams regardless of per-key event skew (a key with 10k refreshes
    * and one tombstone yields 3 epochs, not 10k).
    */
  def withSegmentEpoch(df: DataFrame, key: Seq[String], seq: String, isNil: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(seq))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tombsBefore = coalesce(
      sum(when(col(isNil), 1L).otherwise(0L)).over(w), lit(0L))
    df.withColumn("__epoch",
      (tombsBefore * 2 + when(col(isNil), 2).otherwise(1)).cast("int"))
  }

  /** D4 — top-k per group, e.g. "latest N assets per team".
    * `order` must totally order rows within a group for determinism.
    */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
