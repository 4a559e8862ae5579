package graft

/** Wall-clock accounting for the once-per-(session, sfDir) index builds
  * (synth snapshot, shingle table, LSH/IVF vector indexes, verified pair
  * sets). Each cache's `computeIfAbsent` body runs inside [[timed]], so
  * the bench can report materialize_secs BROKEN DOWN per index instead of
  * one opaque number — the index builds are where the wall-clock lives
  * once query times are sub-second (VERDICT r4 next #2).
  *
  * Times accumulate under a name (a build that runs driver-side jobs in
  * steps still books once), and concurrent builds of DIFFERENT indexes
  * overlap — the per-index seconds are each build's own span, so they can
  * sum to more than the concurrent pass's wall time.
  */
object Materialize {

  private val times = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]

  def timed[T](name: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val r = build
    times.merge(name, (System.nanoTime() - t0) / 1e9,
      (a, b) => java.lang.Double.valueOf(a + b))
    r
  }

  def timings: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    times.asScala.map { case (k, v) => (k, v.doubleValue()) }.toMap
  }

  // --- in-query store-build attribution (VERDICT r9 #5) --------------------
  // The store-LIFECYCLE queries (q_ivf_incremental, q_token_rebucket, ...)
  // build fresh versioned stores INSIDE the query by construction — the
  // oracle must see a deterministic build — so their bench time is
  // build-dominated while the serving read they actually prove is a
  // fraction of it. Each such query wraps its build phase in
  // [[queryBuild]]; Bench snapshots the recorded spans per timed run and
  // publishes a build/serve split per query, keeping the full-catalog
  // number a serving-path signal. Unlike [[timed]], spans here are
  // PER-INVOCATION (a list, not a sum): Bench needs the median across its
  // runs, and Verify's single pass just records one span.

  private val inQueryBuilds =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]]

  def queryBuild[T](query: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val r = build
    inQueryBuilds
      .computeIfAbsent(query, _ => new java.util.concurrent.ConcurrentLinkedQueue)
      .add((System.nanoTime() - t0) / 1e9)
    r
  }

  def queryBuildSpans: Map[String, Seq[Double]] = {
    import scala.jdk.CollectionConverters._
    inQueryBuilds.asScala.map { case (k, q) =>
      (k, q.iterator().asScala.map(_.doubleValue()).toSeq)
    }.toMap
  }

  /** Cumulative build seconds recorded for `query` so far — Bench
    * snapshots this around EACH timed run, so per-run build time is a
    * delta of totals (exact whatever number of builds a run performs),
    * never a positional regrouping of the span list.
    */
  def queryBuildTotal(query: String): Double = {
    val q = inQueryBuilds.get(query)
    if (q == null) 0.0
    else {
      var s = 0.0
      val it = q.iterator()
      while (it.hasNext) s += it.next().doubleValue()
      s
    }
  }

  def resetQueryBuilds(): Unit = inQueryBuilds.clear()

  /** Contamination boundary for timed regions (Bench's per-query loop):
    * take [[timings]] before the region, call this after — any build
    * that executed INSIDE the region fails loudly, because a lazily
    * triggered (re)build would silently inflate whichever query tripped
    * it while looking like steady-state operator cost.
    */
  def assertNoBuildsSince(before: Map[String, Double], where: String): Unit = {
    val grew = timings.filter { case (k, v) =>
      math.abs(v - before.getOrElse(k, 0.0)) > 1e-9
    }
    require(grew.isEmpty,
      s"index build(s) ${grew.keys.toSeq.sorted.mkString(", ")} executed inside " +
        s"$where — materialize in the untimed pass, never under a query timer")
  }
}
