package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constrained-heap SPILL leg (VERDICT r9 next #2): every scaling and
  * interaction run fits the 128 GiB sandbox, so the shuffle/agg/sort
  * spill paths — the binding constraint at 100 TB, where per-executor
  * memory is fixed while data grows — had never fired. This probe runs
  * the volume-heavy declared queries (q_scd2, q_rolling_range,
  * q_ivm_join, q_sessionize, q_minhash_lsh_pairs) on a k×-amplified
  * sf0.1 corpus twice:
  *
  *  - **reference**: uncapped `local[16]` (the sbt JVM's full heap) —
  *    produces the expected per-query digest;
  *  - **capped**: `local-cluster[2,2,1024]` — each executor a separate
  *    1 GiB JVM — with `spark.memory.fraction=0.2`, so execution memory
  *    per task is ~35 MB against multi-hundred-MB sorts/joins: the
  *    data≫memory regime. Asserts every query COMPLETES, its digest
  *    equals the reference (spill is lossless), and the run recorded
  *    NONZERO spill bytes (the paths actually fired — a probe that
  *    never spills proves nothing).
  *
  * Digests are order-independent (count + sum of xxhash64 over the
  * stringified row), so physical plan differences between the two
  * sessions cannot fake a mismatch.
  *
  * Run: `SPARK_HOME=/opt/spark sbt "Test/runMain graft.tools.SpillProbe
  * [sfDir] [k]"`. Prints one JSON line (per-query secs + spill bytes,
  * both phases' digests); exits non-zero on any failure. Output feeds
  * SCALING.md's spill section.
  */
object SpillProbe {

  private final class SpillStats extends SparkListener {
    val mem = new java.util.concurrent.atomic.AtomicLong(0)
    val disk = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled): Unit
      }
    }
  }

  private val Queries = Seq(
    "q_scd2", "q_rolling_range", "q_ivm_join", "q_sessionize",
    "q_minhash_lsh_pairs")

  /** Order-independent digest: (row count, mod-p sum of xxhash64 over
    * the stringified row — modular so ANSI mode can't overflow the sum).
    * Stable across sessions/plans of one Spark build.
    */
  private def digest(df: DataFrame): (Long, Long) = {
    val h = df.select(pmod(
        xxhash64(df.columns.map(c => col(c).cast("string")): _*),
        lit(1000000007L)).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).head()
    (h.getLong(0), if (h.isNullAt(1)) 0L else h.getLong(1))
  }

  /** Write the k×-amplified corpus as a self-contained sfDir: the scaled
    * tables keep the properties the operators' cost models depend on
    * (the ScalingProbe constructions — token-suffixed docs share zero
    * shingles; event/order ids offset per copy; order/line keys offset
    * TOGETHER so the join keys stay consistent); untouched tables copy
    * through.
    */
  private def amplify(s: SparkSession, src: String, out: String, k: Int): Unit = {
    val copies = explode(array((0 until k).map(lit): _*)).as("i")

    graft.Tables.events(s, src).select(copies, col("*"))
      .select(
        (col("event_id") + col("i").cast("long") * 1000000000L).as("event_id"),
        (col("user_id") + col("i").cast("long") * 100000L).as("user_id"),
        (col("ts").cast("long") + col("i").cast("long") * 3456000L)
          .cast("timestamp").as("ts"),
        col("event_type"), col("value"))
      .repartition(32).write.parquet(s"$out/events.parquet")

    graft.Tables.documents(s, src).select(copies, col("*"))
      .select(
        (col("doc_id") + col("i").cast("long") * 10000000L).as("doc_id"),
        col("source"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("i").cast("string"))).as("text"))
      .repartition(32).write.parquet(s"$out/documents.parquet")

    graft.Tables.orders(s, src).select(copies, col("*"))
      .withColumn("o_orderkey",
        col("o_orderkey") + col("i").cast("long") * 100000000L)
      .drop("i")
      .repartition(32).write.parquet(s"$out/orders.parquet")

    graft.Tables.lineitem(s, src).select(copies, col("*"))
      .withColumn("l_orderkey",
        col("l_orderkey") + col("i").cast("long") * 100000000L)
      .drop("i")
      .repartition(32).write.parquet(s"$out/lineitem.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part", "embeddings"))
      s.read.parquet(s"$src/$t.parquet").write.parquet(s"$out/$t.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs SPARK_HOME (separate executor JVMs are the " +
        "point: a capped heap inside local[] would cap the driver too)")
    require(sys.env.get("SPARK_SCALA_VERSION").contains("2.13"),
      "export SPARK_SCALA_VERSION=2.13 — the in-process standalone worker " +
        "builds executor commands without load-spark-env.sh (the " +
        "cluster_verify.sh precedent)")
    var failures = Vector.empty[String]
    def fail(msg: String): Unit = {
      failures :+= msg
      System.err.println(s"[spill-probe] FAIL: $msg")
    }

    // --- phase A: amplify + reference digests on the uncapped heap ---------
    val dir = java.nio.file.Files.createTempDirectory("graft_spill_corpus").toString
    val ref = locally {
      val s = graft.GraftSession.local(16).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      amplify(s, src, dir, k)
      System.err.println(f"[spill-probe] amplified ${k}x corpus in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s at $dir")
      val ds = Queries.map { name =>
        val t1 = System.nanoTime()
        val d = digest(graft.SparkEntry.queries(name)(s, dir))
        System.err.println(f"[spill-probe] reference $name%-22s " +
          f"${(System.nanoTime() - t1) / 1e9}%7.1f s digest=$d")
        name -> d
      }.toMap
      s.stop()
      ds
    }

    // --- phase B: the capped cluster — 1 GiB executors, starved execution
    // memory, so the sorts/joins/aggs behind these queries MUST spill ----
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val spark = graft.GraftSession.builder(shufflePartitions = 8)
      .master("local-cluster[2,2,1024]")
      .config("spark.executor.memory", "1g")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.memory.fraction", "0.2")
      // deterministic spill firing on top of the heap cap: every sorter /
      // window buffer / SMJ buffer force-spills each N rows — the exact
      // code paths (UnsafeExternalSorter.spill & co.) a 100 TB run lives
      // in, exercised on every operator instead of only where the probe
      // corpus happens to cross the memory line
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "50000")
      .config("spark.sql.windowExec.buffer.spill.threshold", "50000")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "50000")
      .config("spark.ui.enabled", "false")
      .appName("graft-spill-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = Queries.map { name =>
      val l = new SpillStats
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val got =
        try Right(digest(graft.SparkEntry.queries(name)(spark, dir)))
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drains async
      spark.sparkContext.removeSparkListener(l)
      spark.sqlContext.clearCache()
      got match {
        case Left(err) => fail(s"$name died on the capped cluster: $err")
        case Right(d) if d != ref(name) =>
          fail(s"$name digest under memory pressure $d != reference ${ref(name)}")
        case Right(_) => ()
      }
      System.err.println(f"[spill-probe] capped    $name%-22s $secs%7.1f s " +
        f"spill mem=${l.mem.get} disk=${l.disk.get}")
      (name, secs, l.mem.get, l.disk.get, got.isRight && got.toOption.get == ref(name))
    }

    val totalSpill = results.map(r => r._3 + r._4).sum
    if (totalSpill == 0)
      fail("no spill recorded anywhere — the probe exercised nothing " +
        "(raise k or lower spark.memory.fraction)")

    val qJson = results.map { case (n, secs, m, d, ok) =>
      f""""$n":{"secs":$secs%.1f,"spill_mem":$m,"spill_disk":$d,"exact":$ok}"""
    }.mkString("{", ",", "}")
    println(s"""{"k":$k,"sf":"$src","executor_mem_mb":1024,""" +
      s""""memory_fraction":0.2,"total_spill_bytes":$totalSpill,""" +
      s""""queries":$qJson,"failures":${failures.size}}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[spill-probe] FAILURES (${failures.size}):")
      failures.foreach(f => System.err.println(s"  $f"))
      sys.exit(1)
    }
    println("[spill-probe] all queries exact under 1 GiB executors with nonzero spill")
  }
}
