package graft.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive / semilattice aggregates.
  *
  * The 100 TB pattern: a materialized per-key aggregate is stored once;
  * each new batch is aggregated ALONE (its own size, not the corpus's) and
  * merged into the stored state by key — the base raw data is never read
  * again. Correct exactly for the aggregate classes whose merge is the
  * aggregate itself: sums/counts (additive) and min/max (semilattice).
  * Non-decomposable metrics (exact distinct, exact median) need sketches
  * (HLL/GK — see `q_sketch_stats`) or a full recompute.
  *
  * [[mergeAdditive]] is one full-outer join on the key — both sides are
  * KEY-CARDINALITY frames (already aggregated), so at scale this shuffles
  * the aggregate, never the data. `q_ivm_agg`'s oracle recomputes the same
  * view from ALL raw rows; the hash gate proves base ⊕ delta == full.
  */
object Ivm {

  /** Merge two per-key aggregate frames with identical schemas:
    * `addCols` sum (null = absent = 0-contribution), `minCols` /
    * `maxCols` take least / greatest (null-skipping — Spark's
    * `least`/`greatest` return the extreme NON-null operand).
    */
  def mergeAdditive(
      base: DataFrame, delta: DataFrame, keys: Seq[String],
      addCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val valCols = addCols ++ minCols ++ maxCols
    require(base.columns.sorted.sameElements(delta.columns.sorted),
      "base and delta must share one schema")
    require((keys ++ valCols).toSet == base.columns.toSet,
      s"every column must be a key or a merged value; " +
        s"unhandled: ${(base.columns.toSet -- keys -- valCols).mkString(", ")}")

    val b = valCols.foldLeft(base) { (df, c) => df.withColumnRenamed(c, s"__b_$c") }
    val d = valCols.foldLeft(delta) { (df, c) => df.withColumnRenamed(c, s"__d_$c") }
    val merged = b.join(d, keys, "full_outer")
    val outs =
      addCols.map(c =>
        (coalesce(col(s"__b_$c"), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c)) ++
      minCols.map(c => least(col(s"__b_$c"), col(s"__d_$c")).as(c)) ++
      maxCols.map(c => greatest(col(s"__b_$c"), col(s"__d_$c")).as(c))
    merged.select(keys.map(col) ++ outs: _*)
  }

  /** Incremental maintenance of a JOIN view `V = A ⋈ B`.
    *
    * Given the stored view and this batch's deltas, the delta-join rule
    * `ΔV = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)` (with `B_new = B_old ∪ ΔB`, so the
    * ΔA⋈ΔB cross-term lands exactly once) maintains the view with work
    * proportional to the DELTAS' join fan-out — the 100 TB view is
    * appended to, never rejoined. Both delta joins shuffle only the delta
    * side plus the matched keys of the big side; at scale the stored
    * tables should be bucketed on the key so even that shuffle drops to a
    * co-located probe (see BucketedJoinSpec).
    *
    * Exactly correct for inner equi-joins (insert-only deltas); deletions
    * need keyed retractions (the tombstone path of `StateStore`), and
    * outer joins need null-row repair — both out of this helper's scope.
    */
  def joinDelta(viewOld: DataFrame, aOld: DataFrame, deltaA: DataFrame,
      bNew: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame =
    viewOld
      .unionByName(deltaA.join(bNew, keys))
      .unionByName(aOld.join(deltaB, keys))
}
