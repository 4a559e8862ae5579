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
  * sub-partitions by salting with a hash of the whole row plus a
  * per-partition ordinal (so even IDENTICAL duplicate rows spread), and
  * replicates the right side `factor`x so every (key, salt) cell still
  * finds its match. The join result is row-identical to the unsalted join;
  * only the shuffle layout changes — the hot key's rows land on `factor`
  * reducers instead of one.
  */
object Skew {

  /** Equi-join `left` (skewed, large) with `right` (matched side) on
    * `keys`, spreading each left key over `factor` reducers.
    *
    * Supported join types: "inner" and "left_outer" (where unmatched LEFT
    * rows survive exactly once). Right-outer/full semantics would see the
    * replicated right side and are rejected.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer only (right side is replicated), got $joinType")
    // per-row salt = hash(row content, per-partition ordinal). The ordinal
    // is what spreads IDENTICAL duplicate rows of a hot key — precisely
    // the rows a skewed event log repeats — across cells; content-only
    // hashing parked them all on one reducer. Correctness under retries:
    // the salt never reaches the output (every (key, salt) cell finds the
    // replicated right side, so the result is the plain join's multiset
    // whatever the salt values), and Spark plans the nondeterministic
    // ordinal with indeterminate-stage retry semantics — a lost shuffle
    // partition recomputes the consumers rather than mixing two layouts.
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col) :+ monotonically_increasing_id(): _*), lit(factor)))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
