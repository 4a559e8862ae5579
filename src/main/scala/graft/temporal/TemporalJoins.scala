package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal JOIN shapes Spark has no native operator for — the two the
  * reference's consumers ask of any temporal store (find everything inside
  * a window; find the version in force at an instant, per row):
  *
  *  - [[pointInInterval]] — range join (point ∈ [start, end)) rewritten to
  *    an EQUI-join on a time grid. A raw inequality join has no equi keys,
  *    so Catalyst can only plan BroadcastNestedLoopJoin — O(|points| ×
  *    |intervals|) compares and a broadcast of a whole side; this operator
  *    never creates that plan shape.
  *  - [[asOfJoin]] — latest-update-at-or-before-each-point, the sorted
  *    union + running-carry formulation: ONE shuffle on the join key, no
  *    per-point subquery, no range explosion at all.
  *
  * Both are pure composition of built-in codegen operators (explode /
  * sort-merge join / window carry) — no UDFs, nothing leaves whole-stage
  * codegen except the joins' exchanges themselves.
  */
object TemporalJoins {

  private val Bucket = "__rb"
  private val AsOfReserved = Seq("__t", "__k", "__p", "__pt")

  /** Range (point-in-interval) join: rows of `points` paired with every
    * row of `intervals` whose half-open window [startCol, endCol) contains
    * the point's `ptCol`. Inner semantics; null times never match (SQL
    * comparison semantics — a null bucket key joins nothing).
    *
    * Plan shape: the time axis is cut into `bucketMicros`-wide cells; each
    * interval explodes into the cells it covers (bounded by
    * `maxBucketsPerInterval`, guarded by one tiny dimension-side agg pass),
    * each point maps to exactly ONE cell — so the join is a plain equi-join
    * on the cell id with the containment predicate left as a residual
    * filter (Catalyst evaluates it inside the join). No point is ever
    * duplicated, so no post-join distinct is needed.
    *
    * At 100 TB: candidate pairs per cell = points-in-cell ×
    * intervals-overlapping-cell — the fan-out is the interval DENSITY per
    * cell, never |intervals|. Pick `bucketMicros` ≈ the typical interval
    * length: shorter cells shrink false candidates but grow the interval
    * explode (factor ≤ span/width + 1). A pathologically hot cell (flash
    * crowd of points under one popular window) is a salted-join candidate
    * ([[graft.state.Skew.saltedJoin]] on the cell id).
    *
    * PRECONDITIONS (checked): point/interval column sets disjoint, `__rb`
    * unused, interval starts at/after the epoch (integer `div` must equal
    * floor-div), widest interval ≤ `maxBucketsPerInterval` cells. Open
    * intervals (null end) must be clamped by the caller first — an
    * unbounded window has no cell list.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long = 15L * 60 * 1000000,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be positive, got $bucketMicros")
    val clash = (points.columns ++ intervals.columns).contains(Bucket)
    require(!clash, s"pointInInterval reserves column name $Bucket; rename the input column")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"point/interval column sets must be disjoint; shared: ${dup.mkString(", ")}")

    def cell(c: String, offMicros: Long = 0L): Column =
      expr(s"(unix_micros(`$c`) + (${offMicros}L)) div ${bucketMicros}L")

    // one guard pass over the DIMENSION side (small by contract): a single
    // min/max row bounds the explode factor before any work happens
    val live = intervals.filter(col(endCol) > col(startCol))
    val g = live
      .agg(min(expr(s"unix_micros(`$startCol`)")),
        max(expr(s"unix_micros(`$endCol`) - unix_micros(`$startCol`)")))
      .head()
    if (!g.isNullAt(0)) {
      require(g.getLong(0) >= 0L,
        "interval starts before 1970 unsupported: integer div != floor-div below the epoch")
      val worst = g.getLong(1) / bucketMicros + 2
      require(worst <= maxBucketsPerInterval,
        s"widest interval covers ~$worst cells > cap $maxBucketsPerInterval — " +
          s"widen bucketMicros or split the interval upstream")
    }

    // end is exclusive: the last covered cell is the one holding end-1µs
    val iv = live.withColumn(Bucket,
      explode(sequence(cell(startCol), cell(endCol, offMicros = -1L))))
    points
      .withColumn(Bucket, cell(ptCol))
      .join(iv, Seq(Bucket))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop(Bucket)
  }

  /** As-of join: every `points` row gains the payload of the LATEST
    * `updates` row sharing its `keys` with update time <= point time
    * (left semantics — points with no prior update keep null payload).
    *
    * Formulation: tag updates 0 / points 1, union on (keys, time, tag),
    * and carry the last non-null payload forward with a running
    * `last(_, ignoreNulls)` window ordered by (time, tag) — an update AT
    * the point's instant wins ("at or before"), and the carry state is
    * O(1) per row. ONE shuffle (the window's partition by key), no
    * inequality join, no candidate blow-up — the canonical distributed
    * as-of shape. Per-key data is externally sorted by the window, so a
    * hot key degrades to disk sort, never OOM.
    *
    * PRECONDITION (caller-owned): (keys, upCol) is unique in `updates` —
    * "latest among equal timestamps" is ill-defined on every engine;
    * dedup first (e.g. [[Temporal.lastWriterPerKey]]).
    */
  def asOfJoin(
      points: DataFrame, ptCol: String,
      updates: DataFrame, upCol: String,
      keys: Seq[String], payloadCols: Seq[String]): DataFrame = {
    val reservedHit =
      (points.columns ++ updates.columns).filter(AsOfReserved.contains).distinct
    require(reservedHit.isEmpty,
      s"asOfJoin reserves ${AsOfReserved.mkString("/")}; rename ${reservedHit.mkString(", ")}")
    val payloadType: StructType =
      updates.select(payloadCols.map(col): _*).schema

    val u = updates.select(
      keys.map(col) ++ Seq(
        col(upCol).as("__t"), lit(0).as("__k"),
        struct(payloadCols.map(col): _*).as("__p"),
        lit(null).cast(StructType(points.schema.fields)).as("__pt")): _*)
    val p = points.select(
      keys.map(col) ++ Seq(
        col(ptCol).as("__t"), lit(1).as("__k"),
        lit(null).cast(payloadType).as("__p"),
        struct(points.columns.toIndexedSeq.map(col): _*).as("__pt")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.unionByName(p)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__k") === 1)
      .select(col("__pt.*") +: payloadCols.map(n => col(s"__p.`$n`").as(n)): _*)
  }
}
