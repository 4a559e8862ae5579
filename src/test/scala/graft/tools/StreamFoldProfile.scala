package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Phase attribution for q_stream_fold_state's bench line
  * (Test/runMain graft.tools.StreamFoldProfile [sfDir]): envelope grid +
  * log write vs the streaming fold vs the store readback, with the fold
  * broken down further by Spark's own durationMs and by per-phase job
  * spans (Pipeline.tagged job descriptions).
  *
  * Measured floor, warm JVM, local[32], 350-envelope batch (r8, after
  * the sided-epoch fast path + fused change-set checkpoint cut the fold
  * from 4.56 s / 37 jobs to ~3.0-3.3 s / 15-20 jobs):
  *
  *   fold:store-write              3 jobs  ~0.6 s  (staging parquet + CAS commit)
  *   fold:epoch1-state-checkpoint  7 jobs  ~0.4 s  (merge plans materialize here)
  *   fold:epoch1-changes-checkpoint 5 jobs ~0.4 s  (fused 4-frame round trip)
  *   fold:epoch-scan               4 jobs  ~0.2 s  (segment-epoch window + agg)
  *   fold:strict-scan              1 job   ~0.15 s (firstInvalid TakeOrdered)
  *   inter-job driver time                 ~1.4 s  (AQE stage planning for ~20
  *                                                  tiny stages + manifest/FS
  *                                                  round trips + scheduler gaps)
  *
  * The remainder is per-micro-batch machinery a production stream pays
  * once per trigger and amortizes over millions of rows (each phase is
  * O(batch) or O(touched buckets) by construction); the walCommit /
  * commitOffsets / queryPlanning engine overheads measure <0.1 s
  * combined. Cutting further means fewer blocking actions per batch —
  * the remaining five are each load-bearing (strict halt contract,
  * epoch ordering, lineage truncation, cache-release safety, the
  * write-side CAS).
  */
object StreamFoldProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSpec.session
    s.range(1000).selectExpr("sum(id)").collect()
    Tables.events(s, dir).count() // warm scan

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sfold] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val base = java.nio.file.Files.createTempDirectory("graft_sfold_prof").toString
      val env = t("envelopes") {
        val pairs = Tables.events(s, dir)
          .select(concat(lit("T"), (col("user_id") % 7).cast("string")).as("team_id"),
            concat(lit("a"), (col("user_id") % 50).cast("string")).as("asset_id"))
          .distinct()
        pairs.select(
          concat(col("team_id"), lit("/"), col("asset_id")).as("key"),
          to_json(struct(
            col("asset_id").as("Id"),
            struct(col("team_id").as("Id"),
              concat(col("team_id"), lit(" name")).as("Name")).as("Team"),
            lit("R:0/O:1/L:0/F:1/P:0+S:1").as("Rolfp"),
            lit(true).as("Scannable"),
            lit("Hostname").as("AssetType"),
            col("asset_id").as("Identifier"))).as("value"),
          array(
            struct(lit("version").as("key"), lit("0.1.2").as("value")),
            struct(lit("type").as("key"), lit("Hostname").as("value")),
            struct(lit("identifier").as("key"), col("asset_id").as("value"))).as("metadata"))
          .orderBy(col("key"))
      }
      t("log_write")(graft.sources.ReplayLog.frameToLog(env, s"$base/log.jsonl"))
      val query = t("stream_start") {
        graft.streaming.StreamIngest.start(
          graft.streaming.StreamIngest.replaySource(s, s"$base/log.jsonl", None),
          s"$base/state", s"$base/ckpt",
          store = graft.streaming.StateStore.Config(buckets = 8))
      }
      // job-count attribution: the fold is a chain of driver-blocking
      // actions (candidate collects, epoch applications, dup guards,
      // bucket probes, table writes) — each ~0.1-0.2 s of fixed latency
      // at this batch size; production batches amortize the same chain
      // over millions of rows
      val counter = new org.apache.spark.scheduler.SparkListener {
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val d = Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short"))).getOrElse("?")
          starts.put(j.jobId, (d, System.nanoTime())): Unit
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (d, t0) =>
            lines.add(f"${(System.nanoTime() - t0) / 1e9}%.4f|${d.take(90)}")
          }: Unit
        }
      }
      s.sparkContext.addSparkListener(counter)
      t("stream_fold")(query.processAllAvailable())
      Thread.sleep(300)
      s.sparkContext.removeSparkListener(counter)
      println(s"[sfold] fold_spark_jobs        ${counter.jobs.get()}")
      // per-micro-batch phase attribution from the engine itself:
      // durationMs names where the non-job driver time goes (planning,
      // offset WAL, commit log, addBatch = the fold's blocking actions)
      locally {
        import scala.jdk.CollectionConverters._
        val progs = query.recentProgress.toSeq
        println(s"[sfold] micro_batches          ${progs.size}")
        val keys = progs.flatMap(_.durationMs.keySet.asScala).distinct.sorted
        for (k <- keys) {
          val tot = progs.flatMap(p => Option(p.durationMs.get(k)).map(_.toLong)).sum
          println(f"[sfold]   durationMs.$k%-22s ${tot / 1e3}%6.2f s total")
        }
      }
      if (round == 2) {
        // group job spans by the fold-phase tag (Pipeline.tagged)
        val byPhase = new scala.collection.mutable.LinkedHashMap[String, (Int, Double)]
        counter.lines.forEach { l =>
          val parts = l.split("\\|", 2)
          val (secs, phase) = (parts(0).toDouble, parts.lift(1).getOrElse("?"))
          val (n, t) = byPhase.getOrElse(phase, (0, 0.0))
          byPhase(phase) = (n + 1, t + secs)
        }
        byPhase.toSeq.sortBy(-_._2._2).foreach { case (phase, (n, t)) =>
          println(f"[sfold]   jobs $n%2d ${t}%6.2f s  $phase")
        }
      }
      t("stream_stop")(query.stop())
      t("store_read_join") {
        def tbl(name: String) = s.read.format("graft-store")
          .option("path", s"$base/state").option("table", name).load()
        tbl("assets").select(col("id"), col("type"), col("identifier"))
          .join(tbl("owns").groupBy(col("asset_id").as("id"))
            .agg(count(lit(1)).as("n_owners")), "id")
          .orderBy(col("id")).count()
      }
    }
    s.stop()
  }
}
