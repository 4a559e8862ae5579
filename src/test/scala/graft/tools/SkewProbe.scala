package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Components, Dedup}

/** Adversarial skew tier for the dedup/LSH joins (VERDICT r9 next #3):
  * SCALING's synthetics are hash-uniform, so the skew claims behind the
  * LSH band join and the verify/election joins were untested. This probe
  * plants the crawl-duplication pathology — ONE viral template duplicated
  * M times, so one band bucket holds the whole family and the band
  * self-join's hot key carries C(M,2) ≈ 90%+ of ALL verified pairs —
  * onto the k×-scaled sf0.1 corpus, then:
  *
  *  1. `lsh_plain` — the oracle-shaped path, recorded as EVIDENCE: the
  *     hot bucket's task writes ~C(M,2) pair rows while the median task
  *     writes a handful (AQE cannot split it — skew split works on input
  *     bytes, and the hot key's input is M rows while its OUTPUT explodes
  *     quadratically).
  *  2. `lsh_capped` — the production path
  *     (`spark.graft.dedup.bandBucketCap`): giant buckets emit CHAIN
  *     pairs (each member vs its neighbor in full-signature order),
  *     O(M log M) not O(M²). ASSERTS the task-time bound (no task above
  *     ~4× its stage median on heavy stages), that the viral family
  *     survives as O(M) chain pairs (in [M-1, bands×(M-1)] — per-band
  *     membership perturbs the chains), that organic pairs are
  *     byte-identical to the plain path, and that connected components
  *     — the consumer shape a 100 TB dedup actually feeds — are
  *     IDENTICAL to the uncapped path's. (Chain, not star: a dissimilar
  *     min-doc_id member would fail every star edge and disconnect the
  *     bucket — ExtSpec pins that adversarial case.)
  *  3. `verify_salted` — Skew.saltedJoin on the verification lookups:
  *     asserts join-identity with the plain verify over the same
  *     candidates, under the task-time bound.
  *  4. `paragraph_dedup` — the election join over the viral corpus
  *     (template segments duplicated M×): asserts the plan-independent
  *     invariant sum(n_kept) == countDistinct(h) under the task-time
  *     bound.
  *
  * Broadcast joins are disabled and AQE skew thresholds scaled down
  * (the ScalingProbe §16 rationale): at 100 TB neither side of these
  * joins broadcasts, so the probe pins the at-scale plan shape.
  *
  * Run: `sbt "Test/runMain graft.tools.SkewProbe [sfDir] [k] [m]"`.
  * Prints one JSON line (per-leg seconds, per-heavy-stage task-time
  * histogram, max task shuffle-write records); exits non-zero on any
  * violated assertion. Output feeds SCALING.md's skew family.
  */
object SkewProbe {

  /** Per-stage task wall-times + max per-task shuffle-write records. */
  private final class TaskStats extends SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]]
    val maxWrite = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null)
        byStage.computeIfAbsent(te.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue).add(te.taskInfo.duration)
      if (te.taskMetrics != null)
        maxWrite.getAndAccumulate(
          te.taskMetrics.shuffleWriteMetrics.recordsWritten, math.max(_, _)): Unit
    }
  }

  /** One heavy stage's histogram row. */
  private final case class StageSkew(stageId: Int, n: Int, totalMs: Long,
      medianMs: Long, maxMs: Long) {
    def ratio: Double = maxMs.toDouble / math.max(medianMs, 1L)
    // the bound: no task above 4x its stage median — with an absolute
    // floor (1.5 s) under which a "4x" is scheduler jitter, not skew
    def violates: Boolean = ratio > 4.0 && maxMs > 1500
    def json: String =
      s"""{"stage":$stageId,"tasks":$n,"total_ms":$totalMs,""" +
        f""""median_ms":$medianMs,"max_ms":$maxMs,"ratio":$ratio%.2f}"""
  }

  private final case class LegRecord(name: String, secs: Double,
      heavy: Seq[StageSkew], maxWriteRecords: Long) {
    def violations: Seq[StageSkew] = heavy.filter(_.violates)
    def json: String =
      f"""{"name":"$name","secs":$secs%.2f,"max_task_write_records":$maxWriteRecords,""" +
        s""""heavy_stages":[${heavy.map(_.json).mkString(",")}],""" +
        s""""skew_ok":${violations.isEmpty}}"""
  }

  private def measure(spark: org.apache.spark.sql.SparkSession, name: String)(
      body: => Unit): LegRecord = {
    val l = new TaskStats
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    try body
    finally {
      Thread.sleep(500) // listener bus drains async
      spark.sparkContext.removeSparkListener(l)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val heavy = l.byStage.asScala.toSeq.map { case (sid, q) =>
      val ds = q.iterator().asScala.map(_.longValue()).toSeq.sorted
      StageSkew(sid, ds.size, ds.sum, ds(ds.size / 2), ds.last)
    }.filter(s => s.n >= 8 && s.totalMs >= 3000).sortBy(-_.totalMs)
    val rec = LegRecord(name, secs, heavy, l.maxWrite.get())
    System.err.println(s"[skew-probe] ${rec.json}")
    rec
  }

  private def assertEmptyDiff(a: DataFrame, b: DataFrame, what: String,
      fail: String => Unit): Unit = {
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    if (extra != 0 || missing != 0)
      fail(s"$what differ: +$extra/-$missing rows")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val m = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    var failures = Vector.empty[String]
    def fail(msg: String): Unit = {
      failures :+= msg
      System.err.println(s"[skew-probe] FAIL: $msg")
    }

    // --- the viral corpus ---------------------------------------------------
    // k x the sf0.1 corpus (token-suffixed: copies share zero shingles)
    // plus ONE template duplicated m times — each dup differs only in a
    // 1-token tail (pairwise J ≈ 0.97), so the whole family lands in one
    // band bucket per band and C(m,2) pairs are real near-dups.
    val template = (0 until 144).map(i => s"viralw$i").mkString(" ")
    val viral = spark.range(0, m).select(
      (col("id") + 900000000L).as("doc_id"),
      concat(lit(template + " vtail"), col("id").cast("string")).as("text"))
    val docs = ScalingProbe.scaleDocs(spark, dir, k)
      .select(col("doc_id"), col("text"))
      .unionByName(viral)
      .repartition(64)
      .localCheckpoint(true)
    val nDocs = docs.count()
    val sh = Dedup.wordShingleDocs(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    System.err.println(s"[skew-probe] corpus: $nDocs docs (${sh.count()} shingled), " +
      s"viral family m=$m at k=$k")

    // pin the at-scale plan shape (see ScalingProbe §16): no broadcast,
    // AQE skew thresholds scaled to probe partition sizes
    val pinned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k")
    pinned.foreach { case (c, v) => spark.conf.set(c, v) }

    val bands = 8 // shared by every leg AND the chain-pair upper bound
    val expectedViralPairs = m.toLong * (m - 1) / 2

    // --- leg 1: plain (oracle-shaped) path — evidence, not assertion --------
    var pairsPlain: DataFrame = null
    val legPlain = measure(spark, "lsh_plain") {
      pairsPlain = Dedup.lshJaccardPairs(sh, bands, r = 2).localCheckpoint(true)
      val viralPairs = pairsPlain.filter(col("doc_a") >= 900000000L).count()
      if (viralPairs != expectedViralPairs)
        fail(s"plain path lost viral pairs: $viralPairs != $expectedViralPairs")
    }

    // --- leg 2: capped (production) path — asserted -------------------------
    var pairsCap: DataFrame = null
    spark.conf.set("spark.graft.dedup.bandBucketCap", "64")
    val legCap =
      try measure(spark, "lsh_capped") {
        pairsCap = Dedup.lshJaccardPairs(sh, bands, r = 2).localCheckpoint(true)
      } finally spark.conf.unset("spark.graft.dedup.bandBucketCap")
    legCap.violations.foreach(s =>
      fail(f"lsh_capped stage ${s.stageId} skew ${s.ratio}%.1fx (max ${s.maxMs} ms)"))
    // the viral family survives as O(m) chain pairs: at least the m-1
    // spanning one bucket, at most bands×(m-1) — per-band membership
    // differs slightly (a dup's tail token can steal one band's minhash),
    // so each band chains its own subset and the unions stay linear,
    // never the C(m,2) quadratic blow-up
    val chainPairs = pairsCap.filter(col("doc_a") >= 900000000L).count()
    if (chainPairs < (m - 1).toLong || chainPairs > bands.toLong * (m - 1))
      fail(s"capped path viral chain pairs: $chainPairs outside [${m - 1}, ${bands * (m - 1)}]")
    // organic pairs (buckets under the cap) are byte-identical
    assertEmptyDiff(
      pairsPlain.filter(col("doc_b") < 900000000L),
      pairsCap.filter(col("doc_b") < 900000000L), "organic pairs", fail)
    // and the consumer contract: connected components are IDENTICAL —
    // the chain spans the giant bucket, so collapse semantics survive
    val ccPlain = Components.connectedComponents(pairsPlain, "doc_a", "doc_b")
      .localCheckpoint(true)
    val ccCap = Components.connectedComponents(pairsCap, "doc_a", "doc_b")
      .localCheckpoint(true)
    assertEmptyDiff(ccPlain, ccCap, "components plain-vs-capped", fail)

    // --- leg 3: salted verification — join-identity under the bound --------
    val cands = Dedup.candidatePairs(sh, bands, r = 2).localCheckpoint(true)
    var vPlain: DataFrame = null
    var vSalted: DataFrame = null
    val legSalt = measure(spark, "verify_salted") {
      vSalted = Dedup.verifyJaccard(cands, sh, saltFactor = 32).localCheckpoint(true)
    }
    legSalt.violations.foreach(s =>
      fail(f"verify_salted stage ${s.stageId} skew ${s.ratio}%.1fx (max ${s.maxMs} ms)"))
    vPlain = Dedup.verifyJaccard(cands, sh).localCheckpoint(true)
    assertEmptyDiff(vPlain, vSalted, "salted-vs-plain verified pairs", fail)

    // --- leg 4: paragraph election join over the viral corpus ---------------
    val legPara = measure(spark, "paragraph_dedup") {
      val segs = docs
        .select(col("doc_id"), graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"), explode(expr(
          "sequence(CAST(0 AS BIGINT), CAST((size(toks)+11) DIV 12 - 1 AS BIGINT))")).as("i"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ", slice(col("toks"), (col("i") * 12 + 1).cast("int"), lit(12))).as("t"))
        .withColumn("h", graft.functions.Md5PrefixLong(col("t"), 15))
        .localCheckpoint(true)
      val key = col("doc_id") * 100000L + col("i")
      val keeper = segs.groupBy(col("h")).agg(min(key).as("kk"))
      val kept = segs.join(keeper, "h")
        .groupBy(col("doc_id"))
        .agg(sum(when(key === col("kk"), 1L).otherwise(0L)).as("n_kept"))
      val totalKept = kept.agg(sum(col("n_kept"))).head().getLong(0)
      val distinctH = segs.select(col("h")).distinct().count()
      // plan-independent invariant: each distinct segment hash is kept
      // exactly once, whatever the join strategy did with the hot keys
      if (totalKept != distinctH)
        fail(s"paragraph election: kept $totalKept != distinct $distinctH")
    }
    legPara.violations.foreach(s =>
      fail(f"paragraph_dedup stage ${s.stageId} skew ${s.ratio}%.1fx (max ${s.maxMs} ms)"))

    pinned.keys.foreach(spark.conf.unset)

    val legs = Seq(legPlain, legCap, legSalt, legPara)
    println(s"""{"k":$k,"m":$m,"n_docs":$nDocs,"sf":"$dir",""" +
      s""""legs":[${legs.map(_.json).mkString(",")}],""" +
      s""""failures":${failures.size}}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[skew-probe] FAILURES (${failures.size}):")
      failures.foreach(f => System.err.println(s"  $f"))
      sys.exit(1)
    }
    println("[skew-probe] all assertions green")
  }
}
