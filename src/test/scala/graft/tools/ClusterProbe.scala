package graft.tools

import org.apache.spark.sql.streaming.Trigger

/** Multi-JVM execution proof (SPARK_HOME=/opt/spark sbt
  * "Test/runMain graft.tools.ClusterProbe [sfDir] [outDir]"; or
  * `scripts/cluster_verify.sh` which also runs the DuckDB compare):
  * the entire declared catalog plus a store fold + CDC cycle under
  * `local-cluster[2,4,...]` — each executor a SEPARATE JVM, so every
  * plan-embedded literal (ArgmaxCell centroid arrays, bloom bit arrays,
  * boilerplate token sets), typed-aggregate buffer (TopKOrdered), and
  * DSv2 reader (graft-store / graft-store-cdc / graft-replay partitions)
  * must actually cross an executor serialization boundary, which
  * `local[32]` never exercises.
  *
  * Everything below `master(...)` is the SAME code path as the local
  * harness: GraftSession's builder, Verify.dump over SparkEntry.queries,
  * StreamIngest's replay-source fold, the DSv2 store reads. The dump is
  * check.py-compatible, so the full oracle gate can run against the
  * multi-JVM results too.
  *
  * Exit code 0 = every query wrote its result and the stream/CDC cycle
  * matched batch replay; non-zero lists the failures.
  */
object ClusterProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_cluster_verify")
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs SPARK_HOME: the standalone worker launches " +
        "each executor as a separate JVM through the launcher scripts")

    // the forked runMain JVM carries the real sbt classpath in -cp;
    // handing it to the executors is what puts the graft classes (and the
    // test fixtures) on the OTHER side of the serialization boundary
    val spark = graft.GraftSession.builder(shufflePartitions = 8)
      .master("local-cluster[2,4,4096]")
      .config("spark.executor.memory", "3g")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.ui.enabled", "false")
      .appName("graft-cluster-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = Vector.empty[String]
    // the fold's store dir, shared by the retry/executor-loss legs below
    var foldStateDir: Option[String] = None

    // ---- 1. the full declared catalog, dumped check.py-compatibly ----------
    val only = args.drop(2).toSet
    val t0 = System.nanoTime()
    val bad = graft.Verify.dump(spark, sfDir, outDir, only)
    graft.Verify.dumpOracleSql(outDir)
    failures ++= bad.map { case (n, m) => s"query $n: $m" }
    val attempted = if (only.isEmpty) graft.SparkEntry.queries.size else only.size
    println(f"[cluster-probe] catalog: ${attempted - bad.size}/$attempted queries ok " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // ---- 2. store fold + CDC cycle -----------------------------------------
    // scenario fixture → graft-replay DSv2 source (paced micro-batches,
    // partitions deserialized on executors) → Pipeline fold → versioned
    // store; then the folded state back through the graft-store DSv2
    // batch reader and the graft-store-cdc stream — equality against
    // driver-side batch replay of the same fixture.
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_cluster_stream").toString
      // the forked runMain packages test resources into a jar — extract to
      // a real file so the DataFrame JSON reader can open it
      val fixture = s"$base/scenario.json"
      val in = getClass.getResourceAsStream("/fixtures/scenario.json")
      try java.nio.file.Files.copy(in, java.nio.file.Paths.get(fixture))
      finally in.close()
      val log = s"$base/scenario.jsonl"
      graft.sources.ReplayLog.toLog(spark, fixture, log)
      val stateDir = s"$base/state"
      foldStateDir = Some(stateDir)
      val src = graft.streaming.StreamIngest.replaySource(spark, log,
        maxOffsetsPerTrigger = Some(7L))
      val query = graft.streaming.StreamIngest.start(src, stateDir, s"$base/ckpt")
      try query.processAllAvailable() finally query.stop()

      def shape(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toString).toSet

      // folded store, read via the DSv2 table (executor-side partition read)
      val stored = spark.read.format("graft-store")
        .option("path", stateDir).option("table", "assets").load()
      val batch = graft.ingest.Pipeline.replay(spark,
        graft.sources.Fixtures.loadJson(spark, fixture))
      if (shape(stored) != shape(batch.assets))
        failures :+= "store fold: graft-store read != batch-replay assets"
      else println(s"[cluster-probe] store fold: ${stored.count()} assets match batch replay")

      // CDC stream from genesis: the replayed change feed must rebuild the
      // same final asset set (adds minus removes per key)
      val cdc = spark.readStream.format("graft-store-cdc")
        .option("path", stateDir).option("table", "assets")
        .option("startingVersion", -1).load()
      val q2 = cdc.writeStream.format("memory").queryName("cluster_probe_cdc")
        .option("checkpointLocation", s"$base/ckpt_cdc")
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      val feed = spark.table("cluster_probe_cdc")
      val net = feed.groupBy("id").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("change") === "added", 1)
            .otherwise(-1)).as("n"))
        .filter(org.apache.spark.sql.functions.col("n") > 0)
      val cdcIds = net.collect().map(_.getString(0)).toSet
      val storeIds = stored.select("id").collect().map(_.getString(0)).toSet
      if (cdcIds != storeIds)
        failures :+= s"cdc replay: net ids ${cdcIds.size} != store ids ${storeIds.size}"
      else println(s"[cluster-probe] cdc replay: ${cdcIds.size} net ids match the store")
    } catch { case e: Throwable =>
      failures :+= s"store fold/CDC cycle: ${e.getClass.getSimpleName}: ${e.getMessage}"
    }

    // ---- 3. task-retry resilience ------------------------------------------
    // local[] never retries tasks (maxFailures=1), so this is the one
    // harness where retry is provable: the first attempt of one task
    // reading the folded store through the DSv2 reader dies, Spark
    // reschedules it (possibly on the other executor JVM), and the result
    // must still be exact — partition readers must be re-creatable and
    // side-effect-free on retry.
    try {
      val stateDir = foldStateDir.getOrElse(
        throw new IllegalStateException("fold leg did not produce a store"))
      val stored = spark.read.format("graft-store")
        .option("path", stateDir).option("table", "assets").load()
      val expected = stored.count()
      val survived = stored.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("planted task failure (attempt 0)")
        it
      }(stored.encoder).count()
      if (survived != expected)
        failures :+= s"task retry: $survived rows after retry != $expected"
      else println(s"[cluster-probe] task retry: planted failure retried, $survived rows exact")
    } catch { case e: Throwable =>
      failures :+= s"task-retry leg: ${e.getClass.getSimpleName}: ${e.getMessage}"
    }

    // ---- 4. executor-loss resilience ---------------------------------------
    // the remaining fault axis a 1000-executor deployment hits daily: an
    // executor JVM DIES mid-job (here: halt(117) from inside a task —
    // bypasses shutdown hooks, so it is a hard process loss, not a clean
    // exit). Spark must mark the executor lost, reschedule its tasks on
    // the surviving JVM (the standalone worker may also relaunch a
    // replacement), and the job's result must still be exact; the session
    // must keep serving catalog queries afterwards.
    try {
      val stateDir = foldStateDir.getOrElse(
        throw new IllegalStateException("fold leg did not produce a store"))
      val stored = spark.read.format("graft-store")
        .option("path", stateDir).option("table", "assets").load()
      val expected = stored.count()
      val lostBefore = spark.sparkContext.getExecutorMemoryStatus.size
      val survived = stored.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 1 && tc.attemptNumber() == 0 &&
          tc.stageAttemptNumber() == 0)
          Runtime.getRuntime.halt(117) // kill THIS executor JVM mid-task
        it
      }(stored.encoder).count()
      if (survived != expected)
        failures :+= s"executor loss: $survived rows after loss != $expected"
      else println(s"[cluster-probe] executor loss: one JVM killed mid-job, " +
        s"$survived rows exact (executors before: $lostBefore)")
      // and the session still answers catalog queries on what remains
      val post = graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
      if (post <= 0) failures :+= "executor loss: post-loss catalog query returned no rows"
      else println(s"[cluster-probe] executor loss: post-loss q1_agg returned $post rows")
    } catch { case e: Throwable =>
      failures :+= s"executor-loss leg: ${e.getClass.getSimpleName}: ${e.getMessage}"
    }

    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[cluster-probe] FAILURES (${failures.size}):")
      failures.foreach(f => System.err.println(s"  $f"))
      sys.exit(1)
    }
    println("[cluster-probe] all green under local-cluster[2,4,4096]")
  }
}
