package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Full-catalog 10x interaction leg (VERDICT r8 next #6). ScalingProbe
  * sweeps operator FAMILIES in isolation — one JVM per scale, one
  * family at a time — so it can never see cross-query effects: cache
  * pressure between the session-level materializations, AQE plan
  * interactions, block-manager churn from 149 queries sharing one
  * executor heap. This probe synthesizes a k x tier of the
  * volume-bearing tables (events, documents, embeddings — the same
  * zero-overlap constructions as ScalingProbe; the TPC-H tables copy
  * at 1x) as an ON-DISK testdata dir, then runs the ENTIRE declared
  * catalog twice in ONE JVM — first against a 1x tier of identical
  * layout, then against the k x tier — and reports per-query ratios.
  *
  * Reading the record: a query over the scaled tables should grow
  * ~linearly (ratio <= k, modulo constant floors which REDUCE the
  * ratio); a query over the 1x TPC-H tables should stay ~flat. The
  * loud gate is ratio > 3k — super-linear by more than 3x under the
  * full-catalog interaction load — which fails the run at the end with
  * the offending list. Run:
  *   Test/runMain graft.tools.InteractionProbe [sfDir] [k]
  */
object InteractionProbe {

  private def scaleDocs(s: SparkSession, dir: String, k: Int): DataFrame =
    Tables.documents(s, dir)
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .select(
        (col("doc_id") + col("i").cast("long") * 10000000L).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("i").cast("string"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def scaleEvents(s: SparkSession, dir: String, k: Int): DataFrame =
    Tables.events(s, dir)
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .select(
        (col("event_id") + col("i").cast("long") * 1000000000L).as("event_id"),
        (col("user_id") + col("i").cast("long") * 100000L).as("user_id"),
        (col("ts").cast("long") + col("i").cast("long") * 3456000L)
          .cast("timestamp").as("ts"),
        col("event_type"), col("value"), col("props"))

  /** k copies of embeddings: vec_id offset per copy; a small per-copy
    * deterministic perturbation on a third of the dimensions keeps the
    * copies from being EXACT duplicates (which would collapse the ANN /
    * SemDeDup cluster structure into k-fold degenerate ties) while
    * preserving the cluster geometry per copy.
    */
  private def scaleEmbeddings(s: SparkSession, dir: String, k: Int): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .select(
        (col("vec_id") + col("i").cast("long") * 10000000L).as("vec_id"),
        transform(col("embedding"), (x, d) =>
          (x + col("i").cast("float") * lit(0.001f) * (d % 3).cast("float"))
            .cast("float")).as("embedding"),
        col("label"))

  private def writeTier(s: SparkSession, srcDir: String, outDir: String,
      k: Int): Unit = {
    new java.io.File(outDir).mkdirs()
    def w(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    w(scaleEvents(s, srcDir, k), "events")
    w(scaleDocs(s, srcDir, k), "documents")
    w(scaleEmbeddings(s, srcDir, k), "embeddings")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      w(s.read.parquet(s"$srcDir/$t.parquet"), t)
  }

  /** Untimed concurrent warm pass (builds the tier's session caches,
    * exactly Bench's shape), then one timed sequential pass.
    */
  private def runCatalog(s: SparkSession, dir: String): Map[String, Double] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(
        Future.sequence(SparkEntry.queries.toSeq.sortBy(_._1).map { case (_, fn) =>
          Future { try fn(s, dir).count() catch { case _: Throwable => () }; () }
        }), Duration.Inf)
    } finally pool.shutdown()
    s.sqlContext.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(s, dir).count() catch { case e: Throwable =>
        System.err.println(s"[interact] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      s.sqlContext.clearCache()
      name -> dt
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_interact").toString
    println(s"[interact] synthesizing tiers under $base (k=$k)")
    writeTier(spark, srcDir, s"$base/t1", 1)
    writeTier(spark, srcDir, s"$base/t$k", k)

    println(s"[interact] catalog pass at 1x")
    val t1 = runCatalog(spark, s"$base/t1")
    println(s"[interact] catalog pass at ${k}x (same JVM — interaction load)")
    val tk = runCatalog(spark, s"$base/t$k")

    val rows = t1.keys.toSeq.sorted.map { q =>
      val ratio = tk(q) / math.max(0.01, t1(q))
      (q, t1(q), tk(q), ratio)
    }
    rows.foreach { case (q, a, b, r) =>
      println(f"[interact] $q%-28s 1x=$a%7.2f s  ${k}x=$b%7.2f s  ratio=$r%6.2f")
    }
    println(f"[interact] total 1x=${rows.map(_._2).sum}%.1f s  " +
      f"${k}x=${rows.map(_._3).sum}%.1f s")
    val outliers = rows.filter(_._4 > 3.0 * k)
    outliers.foreach { case (q, _, _, r) =>
      println(f"[interact] OUTLIER $q ratio=$r%.2f > ${3 * k}")
    }
    spark.stop()
    if (outliers.nonEmpty) {
      System.err.println(s"[interact] ${outliers.size} super-linear outlier(s)")
      sys.exit(1)
    }
  }
}
