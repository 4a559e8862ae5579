package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSql

/** Whole-graph analytics over derived co-occurrence graphs — triangle
  * counting and fixed-iteration PageRank (SURVEY.md §2.C12/C13).
  *
  * These extend the reference's 1-hop/closure traversal surface
  * (inventory/inventory.go:499-628) with the two classic batch-graph
  * measures a relationship-graph inventory grows into: cohesion
  * (triangles / clustering) and centrality (PageRank). Both are
  * expressed as equi-join dataflows so Catalyst plans ordinary shuffled
  * hash joins — no driver-side adjacency, no cartesian expansion.
  */
object GraphAnalytics {

  /** Distinct undirected co-occurrence edges `(a, b), a < b`: items that
    * appear under the same grouping key (parts co-purchased in one order).
    *
    * Scale shape: the self-join is an equi-join on the grouping key, so
    * fan-out per key is (items-per-key choose 2) — bounded by the key's
    * basket size, never by corpus size. The trailing distinct is the only
    * corpus-scale shuffle.
    */
  def coOccurrenceEdges(items: DataFrame, keyCol: String, itemCol: String): DataFrame = {
    val li = items.select(col(keyCol).as("k"), col(itemCol).as("item")).distinct()
    li.alias("x")
      .join(li.alias("y"), col("x.k") === col("y.k") && col("x.item") < col("y.item"))
      .select(col("x.item").as("a"), col("y.item").as("b"))
      .distinct()
  }

  /** Per-node triangle participation counts over an undirected edge set
    * `(a, b), a < b` — `(v, n_tri)` for every vertex in >= 1 triangle.
    *
    * Degree-ordered orientation (the compact-forward / node-iterator++
    * trick): orient every edge from its lower-(degree, id) endpoint to the
    * higher, enumerate wedges u→v, u→w with v before w in that SAME total
    * order, and close each wedge with ONE equi-join probe for v→w. Max
    * out-degree under this orientation is O(sqrt(m)) whatever the degree
    * skew, so wedge count — the intermediate that kills the naive
    * a<b-oriented join on a graph with one hub — is bounded by m^1.5, not
    * by max_degree². Per-node counts are orientation-INVARIANT (each
    * triangle contributes once to each of its three corners), which is why
    * the DuckDB oracle can use plain id-orientation and still hash-match.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // (src, dst, dd) oriented low→high by (degree, id); dd = dst's degree
    // carried so the wedge join can compare endpoints without re-joining.
    val oriented = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst"), col("db").as("dd")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"), col("da").as("dd")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.dd").as("dd"))
      // referenced three times below (both wedge legs + the closing probe);
      // materialize once instead of recomputing the degree joins per use
      .localCheckpoint(true)

    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dd") < col("e2.dd") ||
            (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))

    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))

    tris.select(col("u").as("part"))
      .unionAll(tris.select(col("v").as("part")))
      .unionAll(tris.select(col("w").as("part")))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
  }

  /** Per-node counts of the NEW triangles created by inserting edge batch
    * `dE` into a graph whose union is `eNew` (both `(a, b), a < b`
    * normalized, `dE` disjoint from the old edges) — the incremental
    * maintenance step for a stored [[triangleCounts]] view: merge this
    * delta into the stored counts (`Ivm.mergeAdditive`, additive column)
    * instead of recounting the corpus graph.
    *
    * Every new triangle contains >= 1 delta edge, so enumerating common
    * neighbors of each delta edge's endpoints in `eNew` finds them all;
    * the sorted-triple distinct collapses triangles holding 2 or 3 delta
    * edges (discovered once per delta edge) to exactly one row. Work is
    * O(|dE| x avg-degree) — delta-sized, never corpus-sized.
    */
  def triangleDeltaCounts(dE: DataFrame, eNew: DataFrame): DataFrame = {
    val sym = eNew.select(col("a").as("x"), col("b").as("y"))
      .unionAll(eNew.select(col("b").as("x"), col("a").as("y")))
    val tris = dE
      .join(sym.select(col("x").as("a"), col("y").as("w")), "a")
      .join(sym.select(col("x").as("b"), col("y").as("w")), Seq("b", "w"))
      .select(array_sort(array(col("a"), col("b"), col("w"))).as("t"))
      .distinct()
    tris.select(explode(col("t")).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
  }

  /** k-core of an undirected edge set `(a, b), a < b` — the maximal
    * subgraph in which every vertex has degree >= k, as `(v, deg)` rows
    * with `deg` the vertex's degree INSIDE the core. The fixpoint is
    * unique (the k-core is peel-order-independent), so any engine
    * peeling in any order hash-matches.
    *
    * DELTA peeling, not recount-and-filter: the edge set is materialized
    * ONCE and never rewritten; each round joins it against only the
    * vertices removed THAT round, decrementing their surviving
    * neighbors' degrees — per-round work is O(edges incident to the
    * removed set) and each edge contributes at most two decrements over
    * the WHOLE peel, where the recount form (full degree groupBy + two
    * edge anti-joins + edge rewrite, every round) re-touches all E edges
    * each of its rounds: 17 rounds at sf0.1 made q_kcore the catalog's
    * slowest query, and at 100 TB a 17x edge-scan multiplier is the
    * plan's whole cost. Evolving state is the NODE-sized alive-degree
    * frame only (checkpointed per round for flat lineage); edges stay
    * partitioned in place.
    *
    * Rounds are bounded by `maxRounds` with a loud failure, mirroring
    * `ancestorsClosure`'s contract: real-world graphs peel in a handful
    * of rounds, but a k=2 peel of a long path needs O(length) rounds —
    * callers with deep pathological graphs must raise the cap consciously.
    */
  /** Edge-count threshold under which [[kCore]] runs the whole peel in ONE
    * task (`spark.graft.kcore.localEdgeLimit`, default 2M ≈ 50 MB of
    * adjacency in the task): below it, 15+ rounds of 2-job dataflow are
    * pure scheduling latency (measured: the sf0.1 peel spent ~3.4 s on 34
    * sequential micro-jobs moving kilobytes); above it, the delta-peel
    * dataflow takes over. Same unique fixpoint either way — the k-core is
    * peel-order-independent, and the property spec drives both paths
    * against the same sequential reference.
    */
  private def localEdgeLimit(edges: DataFrame): Long =
    edges.sparkSession.conf.get("spark.graft.kcore.localEdgeLimit", "2000000").toLong

  /** Sequential peel in one task — the textbook O(E) bucket-queue
    * algorithm, for graphs under [[localEdgeLimit]]. Long-typed vertex
    * ids only (the dispatch checks); emits the same `(v, deg)` contract.
    */
  private def kCoreLocal(edges: DataFrame, k: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("a"), col("b")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val adj = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
        it.foreach { case (a, b) =>
          adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
        }
        val deg = scala.collection.mutable.HashMap.empty[Long, Int]
        adj.foreach { case (v, ns) => deg(v) = ns.size }
        val removed = scala.collection.mutable.HashSet.empty[Long]
        val queue = scala.collection.mutable.Queue.empty[Long]
        deg.foreach { case (v, d) => if (d < k) queue.enqueue(v) }
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          if (!removed(v)) {
            removed += v
            adj(v).foreach { w =>
              if (!removed(w)) {
                val d = deg(w) - 1
                deg(w) = d
                if (d == k - 1) queue.enqueue(w)
              }
            }
          }
        }
        deg.iterator.collect { case (v, d) if !removed(v) => (v, d.toLong) }
      }
      .toDF("v", "deg")
  }

  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(maxRounds >= 1, s"maxRounds=$maxRounds must be >= 1")
    val longIds = edges.schema("a").dataType == org.apache.spark.sql.types.LongType &&
      edges.schema("b").dataType == org.apache.spark.sql.types.LongType
    if (longIds && edges.count() <= localEdgeLimit(edges))
      return kCoreLocal(edges, k)
    // symmetric adjacency, built ONCE: one join per round instead of two,
    // and the 2x storage replaces the recount form's per-round edge
    // rewrites entirely
    val esym = edges.select(col("a").as("u"), col("b").as("w"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deg holds ONLY alive (not yet removed) vertices; its `deg` counts
    // edges to other alive vertices once all pending decrements applied
    var deg = GraftSql.localCheckpointMeasuredStats(esym.select(col("u").as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg")))
    // `bad` stays a LAZY narrow filter over the checkpointed deg — each
    // round runs exactly two jobs (the deg checkpoint and the bad count);
    // checkpointing bad itself was a third job buying nothing
    var bad = deg.filter(col("deg") < k).select("v")
    var badCount = bad.count()
    var rounds = 0
    while (badCount > 0) {
      require(rounds < maxRounds,
        s"k-core peel still removing after $maxRounds rounds — deep " +
          "pathological graph? raise maxRounds consciously")
      // neighbors of this round's removals, with multiplicity: each such
      // edge dies, so its OTHER endpoint (if still alive) loses a degree.
      // Decrements aimed at dead or just-removed vertices vanish in the
      // left join below — their deg rows are gone by then.
      val dec = esym.join(bad.withColumnRenamed("v", "u"), "u")
        .groupBy(col("w").as("v")).agg(count(lit(1)).as("d"))
      deg = GraftSql.localCheckpointMeasuredStats(deg.join(bad, Seq("v"), "left_anti")
        .join(dec, Seq("v"), "left")
        .select(col("v"), (col("deg") - coalesce(col("d"), lit(0L))).as("deg")))
      bad = deg.filter(col("deg") < k).select("v")
      badCount = bad.count()
      rounds += 1
    }
    esym.unpersist()
    deg
  }

  /** Fixed-iteration integer PageRank over an undirected edge set
    * `(a, b), a < b` — `(v, rank_ppm)` scaled to parts-per-million, damping
    * 0.85, every arithmetic step an integer `div` so the result is
    * bit-identical on any engine (a float PageRank would diverge across
    * engines in the 15th decimal and break hash gates for no semantic
    * gain — ranking applications read the ORDER, not the mantissa).
    *
    * Scale shape per iteration: one equi-join of the rank vector to the
    * adjacency on `src` + one groupBy(dst) sum — the standard Pregel
    * dataflow. The adjacency (with out-degree pre-joined) is materialized
    * ONCE and reused across iterations; each iteration's rank frame is
    * eagerly localCheckpoint'ed so the loop's lineage stays flat instead
    * of re-planning i joins at iteration i. Undirected symmetrization
    * means every vertex has out-degree >= 1 — no dangling-mass term.
    */
  /** Shared size-adaptive dispatch for the FIXED-ITERATION graph ops
    * (PageRank, label propagation): under the edge threshold the whole
    * integer-lattice fold runs in one task — k iterations of join
    * dataflow on a small graph are pure scheduling latency — and the
    * sequential twin replays the SAME integer arithmetic step for step,
    * so the result is bit-identical (both ops are deterministic folds,
    * not fixpoints: there is no peel-order freedom to rely on, which is
    * exactly why the twins mirror the lattice ops literally and the
    * property specs drive both paths against each other).
    */
  private def localLimit(edges: DataFrame, conf: String): Long =
    edges.sparkSession.conf.get(conf, "2000000").toLong

  private def longPairs(edges: DataFrame): Option[DataFrame] =
    if (edges.schema("a").dataType == org.apache.spark.sql.types.LongType &&
      edges.schema("b").dataType == org.apache.spark.sql.types.LongType)
      Some(edges.select(col("a"), col("b"))) else None

  private def pageRankLocal(edges: DataFrame, iters: Int, scale: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val base = 15L * scale / 100L
    edges.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      it.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
      }
      var r = scala.collection.mutable.HashMap.empty[Long, Long]
      adj.keysIterator.foreach(v => r(v) = scale)
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
        adj.foreach { case (u, ns) =>
          val c = r(u) / ns.size // `div` on non-negative longs = /
          ns.foreach(w => contrib(w) = contrib.getOrElse(w, 0L) + c)
        }
        val next = scala.collection.mutable.HashMap.empty[Long, Long]
        contrib.foreach { case (v, s) => next(v) = base + 85L * s / 100L }
        r = next
      }
      r.iterator
    }.toDF("v", "rank_ppm")
  }

  def pageRankInt(edges: DataFrame, iters: Int = 5, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    longPairs(edges) match {
      case Some(e) if e.count() <= localLimit(edges, "spark.graft.pagerank.localEdgeLimit") =>
        return pageRankLocal(e, iters, scale)
      case _ =>
    }
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // adjacency with the source's out-degree inlined, pre-partitioned on
    // the iteration join key so each iteration exchanges only the (much
    // smaller) rank vector, never the adjacency; one shuffle, reused
    val adj = sym.join(deg, "src").repartition(col("src")).localCheckpoint(true)

    val base = 15L * scale / 100L // (1-d) * scale with d = 0.85
    var ranks = GraftSql.localCheckpointMeasuredStats(deg.select(col("src").as("v"), lit(scale).as("r")))
    for (_ <- 1 to iters) {
      ranks = GraftSql.localCheckpointMeasuredStats(adj.join(ranks, col("src") === col("v"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst")
        .agg((lit(base) + expr("85 * sum(c) div 100")).as("r"))
        .select(col("dst").as("v"), col("r")))
    }
    ranks.select(col("v"), col("r").as("rank_ppm"))
  }

  /** Synchronous label-propagation community detection over an undirected
    * `(a, b)` edge set: every vertex starts labeled with its own id; each
    * round it adopts the PLURALITY label among its neighbors, ties to the
    * smallest label. A FIXED round count is the semantic contract (sync
    * LP can oscillate on bipartite-ish structures, so "run to
    * convergence" is not well-defined — the fixed-round fold is
    * deterministic on every engine and is how LP is deployed in practice).
    *
    * Scale shape per round: one equi-join of the label vector against the
    * pre-partitioned adjacency (only the label vector moves) + two
    * aggregations. The plurality argmax is `max(struct(cnt, -lbl))` —
    * lexicographic max = highest count then smallest label, one
    * aggregate, no window, integer-only (hash-gateable cross-engine).
    * Lineage stays flat via per-round eager checkpoints (the
    * [[pageRankInt]] contract).
    */
  private def labelPropLocal(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      it.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
      }
      var lbl = scala.collection.mutable.HashMap.empty[Long, Long]
      adj.keysIterator.foreach(v => lbl(v) = v)
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.HashMap.empty[Long, Long]
        adj.foreach { case (v, ns) =>
          val counts = scala.collection.mutable.HashMap.empty[Long, Long]
          ns.foreach { w =>
            val l = lbl(w); counts(l) = counts.getOrElse(l, 0L) + 1L
          }
          // plurality, ties to the SMALLEST label — max(struct(cnt, -lbl))
          next(v) = counts.foldLeft((0L, Long.MaxValue)) {
            case ((bc, bl), (l, c)) =>
              if (c > bc || (c == bc && l < bl)) (c, l) else (bc, bl)
          }._2
        }
        lbl = next
      }
      lbl.iterator
    }.toDF("part", "community")
  }

  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    longPairs(edges) match {
      case Some(e) if e.count() <= localLimit(edges, "spark.graft.labelprop.localEdgeLimit") =>
        return labelPropLocal(e, iters)
      case _ =>
    }
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")).localCheckpoint(true)
    var lbl = GraftSql.localCheckpointMeasuredStats(sym.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")))
    for (_ <- 1 to iters) {
      lbl = GraftSql.localCheckpointMeasuredStats(sym.join(lbl.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("v"), (-col("m.nl")).as("lbl")))
    }
    lbl.select(col("v").as("part"), col("lbl").as("community"))
  }
}
