package graft.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for large-large equi-joins — the escape hatch
  * when AQE's runtime skew-join splitting isn't enough (e.g. a single
  * pathological key that dwarfs every split target, or a build side too
  * big to broadcast).
  *
  * [[saltedJoin]] splits each left-side key's rows across `factor`
  * sub-partitions by salting with a deterministic hash of the whole row,
  * and replicates the right side `factor`x so every (key, salt) cell still
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
    // deterministic per-row salt: identical input rows always salt the
    // same way, so retried tasks reproduce the same layout (rand() would
    // break retry determinism)
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(factor)))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
