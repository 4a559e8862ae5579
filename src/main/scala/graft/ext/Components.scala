package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSql
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-duplicate PAIRS into duplicate CLUSTERS so a
  * dedup pipeline can keep one canonical document per cluster (the
  * reference stops at pair emission; training-data dedup needs the
  * collapse).
  *
  * Algorithm: every node starts labeled with its own id; each round a node
  * takes the min of its label and its neighbors' labels. A round is one
  * equi-join (edges × labels, both hash-partitioned on the join key) plus
  * one aggregation — no driver-side graph state, rows only.
  *
  * Convergence detection is O(1) per round: labels are monotonically
  * non-increasing, so sum(label) strictly decreases until the fixpoint and
  * comparing one aggregated long per round (a single-row collect) detects
  * it exactly — no row-level diff join.
  *
  * Round count: plain hash-min alone needs diameter-many rounds, which on
  * a general graph (long chains in the sf0.1 co-purchase graph put
  * q_graph_cc at 5.2 s) is the scale risk — 100 TB graphs have long paths.
  * Each round therefore ALSO folds in the label's own label (pointer
  * jumping: lbl(lbl(id)) via one node-sized self-join), so label paths
  * halve every round and convergence is O(log diameter) — same fixpoint,
  * labels still monotonically non-increasing, so the O(1) sum-based
  * convergence check is unchanged. This is the hash-min + pointer-jumping
  * hybrid from Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (their two-phase variant); LSH near-dup clusters are
  * near-cliques that close in 2-3 rounds either way, general graphs drop
  * from O(d) to O(log d).
  */
object Components {

  /** Connected components of the undirected graph given as (src, dst)
    * pairs (either orientation, duplicates fine). Returns one row per
    * node: (id, cluster_id) where cluster_id = min node id reachable.
    *
    * @param maxRounds hard stop — throws if the graph has not converged,
    *        rather than silently emitting partial components.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, srcCol, dstCol, maxRounds)._1

  /** [[connectedComponents]] plus the number of rounds the fixpoint took —
    * the observable that lets a test PIN the O(log diameter) convergence
    * (a depth-64 chain must close in ~log2(64) rounds, not 64).
    */
  /** Edge-count threshold under which the whole labeling runs as ONE
    * task of union-find (`spark.graft.cc.localEdgeLimit`, default 2M):
    * below it, log-diameter rounds of join dataflow are pure scheduling
    * latency; above it, the hash-min + pointer-jumping dataflow takes
    * over. Union-by-min-root makes every final root the component's min
    * id — the identical fixpoint (and identical to ComponentsSpec's
    * reference). The local path reports rounds = 0.
    */
  private def localEdgeLimit(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.cc.localEdgeLimit", "2000000").toLong

  private def ccLocal(fwd: DataFrame): DataFrame = {
    val spark = fwd.sparkSession
    import spark.implicits._
    fwd.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        // roots merge toward the smaller id, so a set's root IS its min
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keysIterator.map(v => (v, find(v))).toArray.iterator
    }.toDF("id", "cluster_id")
  }

  def connectedComponentsWithRounds(pairs: DataFrame, srcCol: String,
      dstCol: String, maxRounds: Int = 25): (DataFrame, Int) = {
    // materialize the input ONCE before orienting: `fwd` is referenced
    // twice (forward + reversed union) and the caller's pairs frame is
    // typically an expensive pipeline (the LSH verify chain) — without
    // the eager checkpoint it would run end-to-end twice (measured 5.3 s
    // -> 3.1 s on q_dedup_components at sf0.1)
    val fwd = pairs.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    if (fwd.count() <= localEdgeLimit(fwd)) return (ccLocal(fwd), 0)
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lbl = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // null on an empty graph — treat as 0 so empty input converges in one
    // round instead of NPEing
    def lblSum(df: DataFrame): Long = {
      val v = df.agg(sum(col("lbl"))).head().get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }

    var prevSum = lblSum(lbl)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val prop = edges.join(lbl.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("lbl"))
      // pointer jump: every label IS a node id (the min seen so far), so
      // looking the label up in lbl itself is a total inner join on two
      // node-sized frames — far smaller than the edge join above
      val jump = lbl.select(col("id"), col("lbl").as("j"))
        .join(lbl.withColumnRenamed("id", "j"), "j")
        .select(col("id"), col("lbl"))
      // localCheckpoint (eager) TRUNCATES LINEAGE each round — next's plan
      // references lbl's plan twice (union + join), so without truncation
      // the logical tree doubles per round and plan rendering alone OOMs
      // the driver after ~8 rounds. Checkpointed blocks are row-sized
      // (one per node), dropped when the frame is GC'd.
      val next = GraftSql.localCheckpointMeasuredStats(lbl.union(prop).union(jump)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl")))
      val s = lblSum(next)
      lbl.unpersist()
      lbl = next
      converged = s == prevSum
      prevSum = s
      round += 1
    }
    edges.unpersist()
    require(converged, s"connected components did not converge in $maxRounds rounds")
    (lbl.select(col("id"), col("lbl").as("cluster_id")), round)
  }
}
