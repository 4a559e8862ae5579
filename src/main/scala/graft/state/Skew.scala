package graft.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for large-large equi-joins — the escape hatch
  * when AQE's runtime skew-join splitting isn't enough (e.g. a single
  * pathological key that dwarfs every split target, or a build side too
  * big to broadcast).
  *
  * Where it is and is NOT wired:
  *  - NOT the ingestion merges (Upserts/Merge): their join keys are
  *    unique per side BY CONSTRUCTION — updates are pre-aggregated per
  *    natural key before every merge — so no key can own more than one
  *    row per side and there is nothing for a salt to spread. The hot-KEY
  *    stress case is per-key event pileup BEFORE the merge, absorbed by
  *    map-side partial aggregation: a 10k-single-key replay
  *    (tools/ReplayProbe, measured this round: 25.9 s, 3 segment epochs)
  *    bottlenecks on per-epoch plan fan-out, not on any join reducer.
  *  - WIRED into near-dup verification ([[graft.ext.Dedup.verifyJaccard]]
  *    via the streaming dedup), where a heavily duplicated corpus puts
  *    one doc_id into O(dups) candidate pairs against a corpus-scale,
  *    non-broadcastable signature table — the exact single-hot-key,
  *    large-large shape AQE's byte-size splitting handles late and a
  *    salt prevents outright.
  *
  * [[saltedJoin]] splits each left-side key's rows across `factor`
  * sub-partitions by salting with a hash of the WHOLE ROW (deterministic:
  * retried tasks reproduce the same layout; a positional ordinal would
  * re-salt rows differently on a shuffle retry and mix two layouts), and
  * replicates the right side `factor`x so every (key, salt) cell still
  * finds its match. The join result is row-identical to the unsalted join;
  * only the shuffle layout changes — the hot key's DISTINCT rows land on
  * `factor` reducers instead of one. IDENTICAL duplicate rows hash
  * identically and would share a cell; duplicate-heavy inputs (a skewed
  * event log repeating one event) pass `duplicateSafe = true`, which
  * collapses exact duplicates to one row + multiplicity BEFORE the join
  * and re-expands after — hot-cell join work drops to O(distinct rows)
  * and the salt stays deterministic.
  */
object Skew {

  /** Equi-join `left` (skewed, large) with `right` (matched side) on
    * `keys`, spreading each left key over `factor` reducers.
    *
    * Supported join types: "inner" and "left_outer" (where unmatched LEFT
    * rows survive exactly once). Right-outer/full semantics would see the
    * replicated right side and are rejected.
    *
    * @param duplicateSafe collapse exact duplicate left rows (one extra
    *        left-side shuffle) so repeats of one row cannot pile up in one
    *        salt cell; leave false when left rows are distinct by
    *        construction (e.g. a candidate-pair set already distinct()ed)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner",
      duplicateSafe: Boolean = false): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer only (right side is replicated), got $joinType")
    // the helper columns are plumbing, never output — but an input that
    // already carries one of the reserved names would silently collide
    // (the post-join drop would eat the caller's column, and duplicateSafe
    // would explode the wrong __cnt); refuse loudly instead (ADVICE r4)
    val reserved = Seq("__salt", "__cnt", "__i")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"saltedJoin reserves column names ${reserved.mkString("/")}; " +
        s"rename input column(s) ${clash.distinct.mkString(", ")}")
    // duplicateSafe groups by EVERY left column; map-typed columns are not
    // groupable and would fail mid-plan with an opaque analysis error
    if (duplicateSafe) {
      val maps = left.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => f.name
      }
      require(maps.isEmpty,
        s"duplicateSafe groups by all left columns; map-typed column(s) " +
          s"${maps.mkString(", ")} are not groupable — drop or serialize them first")
    }
    if (!duplicateSafe) saltedCore(left, right, keys, factor, joinType)
    else {
      val collapsed = left.groupBy(left.columns.toIndexedSeq.map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
      saltedCore(collapsed, right, keys, factor, joinType)
        .withColumn("__i", explode(sequence(lit(1L), col("__cnt"))))
        .drop("__cnt", "__i")
    }
  }

  /** Salt-and-replicate core. The salt is a DETERMINISTIC content hash —
    * the salt never reaches the output, and a retried task lands every
    * row in the same cell it chose the first time.
    */
  private def saltedCore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String): DataFrame = {
    // hash() rejects MAP columns (undefined hashcodes); salting on the
    // remaining columns keeps determinism and spread — rows equal in
    // every non-map column share a cell, which only affects layout
    val hashable = left.columns.filter(c =>
      !left.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    require(hashable.nonEmpty, "saltedJoin needs at least one non-map left column to salt on")
    val l = left.withColumn("__salt",
      pmod(hash(hashable.toIndexedSeq.map(col): _*), lit(factor)))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
