package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.ext.{CorpusIndex, Release}
import graft.streaming.{StateStore, TableStore}

/** End-to-end production scenario with HARD mid-run kills (VERDICT r9
  * next #4): every piece existed — replay source → Pipeline fold,
  * streaming corpus-index maintenance, dedup/decontaminate,
  * Release.run — but nothing composed the FULL chain and killed it
  * mid-flight. This probe does, across real process boundaries:
  *
  *  - The CHILD (a forked JVM, same classpath) runs the whole chain:
  *    (1) the asset replay log folded into the versioned graph store
  *    through the checkpointed streaming sink; (2) a document EVENT
  *    stream (file source, one file per micro-batch, checkpointed)
  *    maintaining THREE versioned stores per batch — the token frame,
  *    the shingle frame (both via [[CorpusIndex.foldDocBatch]]) and the
  *    raw-document table (same last-writer fold); (3) the export: the
  *    maintained document table written as a corpus dir, the MAINTAINED
  *    shingle/token frames seeded as that dir's persisted stores (so the
  *    release-side dedup/decontamination consumes the stream-maintained
  *    frames, not a rebuild), and [[Release.run]] writing the artifact.
  *  - The PARENT orchestrates: a CONTROL child runs never-killed; the
  *    KILLED lineage is `Runtime.halt(137)`'d twice mid-stream — once
  *    BETWEEN the corpus-index commit and the raw-docs commit of a batch
  *    (the stores land one version apart; each side's replay must
  *    converge) and once AFTER all three commits but BEFORE the sink's
  *    checkpoint commit (the whole batch replays; every store recommits
  *    idempotently) — then restarted from checkpoints until it
  *    completes.
  *
  * Assertions: the killed lineage's release corpus/card/manifest equal
  * the control's row for row; the maintained token and shingle frames
  * are hash-equal across lineages; and the killed lineage's maintained
  * shingle frame equals a from-raw derivation of its final documents
  * (the incremental-path-loses-nothing invariant, post-crash). Together
  * they prove the checkpoint/batchId-idempotence contracts COMPOSE
  * across stores and survive hard process death.
  *
  * Run: `sbt "Test/runMain graft.tools.PipelineKillProbe [sfDir]"`.
  * Prints one JSON line; exits non-zero on any failure.
  */
object PipelineKillProbe {

  private val DocsSpec = TableStore.Spec("docs", Seq("doc_id"))
  private val cfg = StateStore.Config(buckets = 8)

  private val envSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType), StructField("lang", StringType),
    StructField("n_chars", LongType), StructField("op", StringType),
    StructField("seq", LongType)))

  /** Last-writer fold of the RAW document rows into the docs table —
    * the [[CorpusIndex.foldDocBatch]] contract applied to the unreduced
    * envelope (max seq wins, delete beats upsert on ties, batchId-keyed
    * idempotent versions).
    */
  private def foldRawDocs(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long): Unit = {
    val last = batch
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("source"), col("text"), col("lang"), col("n_chars"), col("op")),
        struct(col("seq"), (col("op") === "delete").cast("int"))).as("r"))
      .select(col("doc_id"), col("r.source"), col("r.text"), col("r.lang"),
        col("r.n_chars"), col("r.op"))
      .localCheckpoint(true)
    val ups = last.filter(col("op") =!= "delete").drop("op")
    val dels =
      if (TableStore.latestVersion(spark, root, batchId).isEmpty) None
      else Some(last.filter(col("op") === "delete").select(col("doc_id")))
    TableStore.write(spark, root, batchId + 1, Seq(DocsSpec),
      Map("docs" -> ups), delta = true, cfg = cfg,
      deletes = dels.map("docs" -> _).toMap)
  }

  /** (row count, mod-p content hash) of a frame, order-independent. */
  private def digest(df: DataFrame): (Long, Long) = {
    val h = df.select(pmod(
        xxhash64(df.columns.sorted.map(c => col(c).cast("string")): _*),
        lit(1000000007L)).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).head()
    (h.getLong(0), if (h.isNullAt(1)) 0L else h.getLong(1))
  }

  // --- the child: the full chain, with optional planted halts --------------

  private def childMain(base: String, runDir: String, killMode: String,
      killBatch: Long): Unit = {
    val spark = graft.GraftSession.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. asset replay -> checkpointed fold into the versioned graph store
    // (a restarted child resumes from the checkpoint: already-folded
    // batches are not re-ingested)
    val src = graft.streaming.StreamIngest.replaySource(spark,
      s"$base/scenario.jsonl", maxOffsetsPerTrigger = Some(7L))
    val gq = graft.streaming.StreamIngest.start(src, s"$runDir/state",
      s"$runDir/ckpt_graph")
    try gq.processAllAvailable() finally gq.stop()

    // 2. the document event stream maintaining all three stores
    val corpusRoot = s"$runDir/corpus_idx"
    val docsRoot = s"$runDir/docs_store"
    val dq = spark.readStream.schema(envSchema)
      .option("maxFilesPerTrigger", 1)
      .json(s"$base/docevents")
      .writeStream
      .option("checkpointLocation", s"$runDir/ckpt_docs")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val b = batch.localCheckpoint(true)
        CorpusIndex.foldDocBatch(b.sparkSession, corpusRoot,
          b.select(col("doc_id"), col("source"), col("text"), col("op"), col("seq")),
          bid)
        // kill point A: corpus-index committed, raw-docs NOT — the roots
        // land one version apart; replay must converge both
        if (killMode == "mid" && bid == killBatch) Runtime.getRuntime.halt(137)
        foldRawDocs(b.sparkSession, docsRoot, b, bid)
        // kill point B: every store committed, the sink's checkpoint NOT
        // — the whole batch replays; every store recommits idempotently
        if (killMode == "post" && bid == killBatch) Runtime.getRuntime.halt(137)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try dq.processAllAvailable() finally dq.stop()

    // 3. export + release: the maintained docs table becomes the corpus
    // dir; the MAINTAINED frames seed that dir's persisted stores so the
    // release-side dedup/decontamination serves the stream-built frames
    val sf = s"$runDir/sf"
    val finalDocs = TableStore.read(spark, docsRoot,
      TableStore.latestVersion(spark, docsRoot).get, "docs")
    finalDocs.select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val relRoot = CorpusIndex.storeRootFor(sf) // fingerprint AFTER the write
    CorpusIndex.writeTokenFrame(spark, relRoot,
      CorpusIndex.storedTokens(spark, corpusRoot))
    CorpusIndex.writeShingleFrame(spark, relRoot,
      CorpusIndex.storedShingles(spark, corpusRoot))
    val summary = Release.run(spark, sf, s"$runDir/release")
    println(s"[kill-probe-child] released ${summary.nDocs} docs: ${summary.bySplit}")
    spark.stop()
  }

  // --- the parent: orchestration + equality gates ---------------------------

  private def fork(base: String, runDir: String, killMode: String,
      killBatch: Long, expectExit: Int): Unit = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // Spark 4.x on JDK 17 needs the module opens when SparkSession is
    // created outside spark-submit — same list build.sbt injects into
    // forked test JVMs, taken from Spark's own launcher constant
    val opens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split("\\s+").toSeq.filter(_.nonEmpty)
    val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx6g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.tools.PipelineKillProbe",
      "--child", base, runDir, killMode, killBatch.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(
      s"$base/child_${new java.io.File(runDir).getName}_${killMode}_$killBatch.log"))
    val p = pb.start()
    val exit = p.waitFor()
    require(exit == expectExit,
      s"child ($killMode@$killBatch) exited $exit, expected $expectExit " +
        s"— see ${pb.redirectOutput().file()}")
    System.err.println(s"[kill-probe] child $killMode@$killBatch exited $exit (expected)")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--child")) {
      childMain(args(1), args(2), args(3), args(4).toLong)
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft_kill_probe").toString
    var failures = Vector.empty[String]
    def fail(msg: String): Unit = {
      failures :+= msg
      System.err.println(s"[kill-probe] FAIL: $msg")
    }

    // --- prepare inputs (own session, stopped before the children run) -----
    locally {
      val s = graft.GraftSession.local(8).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val fixture = s"$base/scenario.json"
      val in = getClass.getResourceAsStream("/fixtures/scenario.json")
      try java.nio.file.Files.copy(in, java.nio.file.Paths.get(fixture))
      finally in.close()
      graft.sources.ReplayLog.toLog(s, fixture, s"$base/scenario.jsonl")

      // document events from the real corpus: late arrivals, a stale
      // upsert corrected later, deletes, and redelivered duplicates —
      // the last-writer envelope the D3 family pins
      val docs = graft.Tables.documents(s, sfDir)
        .select(col("doc_id"), col("source"), col("text"), col("lang"), col("n_chars"))
      def ev(df: DataFrame, op: String, seq: Long): DataFrame =
        df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
      val batches = Seq(
        // b0: most of the corpus arrives
        ev(docs.filter(col("doc_id") % 3 =!= 2), "upsert", 0L),
        // b1: a STALE re-crawl of the %5 docs (truncated text)
        ev(docs.filter(col("doc_id") % 5 === 0)
          .withColumn("text", substring(col("text"), 1, 25)), "upsert", 1L),
        // b2: the correction (true text) + takedown of the %7==3 docs
        ev(docs.filter(col("doc_id") % 5 === 0), "upsert", 2L)
          .unionByName(ev(docs.filter(col("doc_id") % 7 === 3), "delete", 2L)),
        // b3: late arrivals + a second takedown wave
        ev(docs.filter(col("doc_id") % 3 === 2), "upsert", 3L)
          .unionByName(ev(docs.filter(col("doc_id") % 11 === 5), "delete", 3L)),
        // b4: duplicate redelivery of b3's arrivals (same seq — no-op)
        ev(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 4 === 1),
          "upsert", 3L))
      val evDir = new java.io.File(s"$base/docevents"); evDir.mkdirs()
      batches.zipWithIndex.foreach { case (b, i) =>
        val tmp = s"$base/ev_tmp_$i"
        b.coalesce(1).write.json(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".json")).get
        val dst = new java.io.File(evDir, f"b$i%02d.json")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        // strictly increasing mtimes pin the file-source batch order
        dst.setLastModified(1700000000000L + i * 60000L): Unit
      }
      s.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }

    // --- control: never killed ----------------------------------------------
    fork(base, s"$base/control", "none", -1L, expectExit = 0)
    // --- killed lineage: two hard halts, then a clean resume ----------------
    fork(base, s"$base/killed", "mid", 1L, expectExit = 137)
    fork(base, s"$base/killed", "post", 2L, expectExit = 137)
    fork(base, s"$base/killed", "none", -1L, expectExit = 0)

    // --- equality gates ------------------------------------------------------
    val s = graft.GraftSession.local(8).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def table(run: String, root: String, t: String): DataFrame =
      TableStore.read(s, s"$base/$run/$root",
        TableStore.latestVersion(s, s"$base/$run/$root").get, t)
    def cmp(what: String, a: DataFrame, b: DataFrame): Unit = {
      val extra = a.exceptAll(b).count(); val missing = b.exceptAll(a).count()
      if (extra != 0 || missing != 0) fail(s"$what differ: +$extra/-$missing")
      else System.err.println(s"[kill-probe] $what: identical (${a.count()} rows)")
    }
    cmp("release corpus",
      s.read.parquet(s"$base/control/release/corpus"),
      s.read.parquet(s"$base/killed/release/corpus"))
    cmp("release manifest",
      s.read.parquet(s"$base/control/release/manifest"),
      s.read.parquet(s"$base/killed/release/manifest"))
    cmp("release card",
      s.read.parquet(s"$base/control/release/card"),
      s.read.parquet(s"$base/killed/release/card"))
    cmp("maintained docs table",
      table("control", "docs_store", "docs"), table("killed", "docs_store", "docs"))
    cmp("maintained token frame",
      table("control", "corpus_idx/text_tokens", "tokens"),
      table("killed", "corpus_idx/text_tokens", "tokens"))
    cmp("maintained shingle frame",
      table("control", "corpus_idx/text_shingles", "shingles"),
      table("killed", "corpus_idx/text_shingles", "shingles"))
    // incremental-path-loses-nothing, POST-CRASH: the killed lineage's
    // maintained shingle frame equals a from-raw derivation of its final
    // documents (same digest as the q_token_incremental proof shape)
    val fromRaw = digest(CorpusIndex.shingleRows(
      table("killed", "docs_store", "docs")
        .select(col("doc_id"), col("source"), col("text"))))
    val maintained = digest(table("killed", "corpus_idx/text_shingles", "shingles"))
    if (fromRaw != maintained)
      fail(s"post-crash shingle frame $maintained != from-raw $fromRaw")
    else System.err.println(s"[kill-probe] post-crash from-raw equivalence: $maintained")
    val graphAssets = cmpGraph(s, base, fail)

    println(s"""{"base":"$base","graph_assets":$graphAssets,""" +
      s""""failures":${failures.size}}""")
    s.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[kill-probe] FAILURES (${failures.size}):")
      failures.foreach(f => System.err.println(s"  $f"))
      sys.exit(1)
    }
    println("[kill-probe] killed lineage == control through the full chain")
  }

  /** The graph leg's own equality: both lineages' folded asset stores. */
  private def cmpGraph(s: SparkSession, base: String,
      fail: String => Unit): Long = {
    def assets(run: String): DataFrame =
      s.read.format("graft-store")
        .option("path", s"$base/$run/state").option("table", "assets").load()
    val a = assets("control"); val b = assets("killed")
    val extra = a.exceptAll(b).count(); val missing = b.exceptAll(a).count()
    if (extra != 0 || missing != 0) fail(s"folded asset stores differ: +$extra/-$missing")
    a.count()
  }
}
