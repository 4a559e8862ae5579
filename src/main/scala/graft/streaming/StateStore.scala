package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.graph.GraphOps.State
import graft.schema.Schemas
import graft.state.ChangeSet

/** Versioned, hash-partitioned snapshot store for the four graph tables —
  * the streaming sink's answer to write amplification (reference sink:
  * a remote graph API, inventory/inventory.go; here: parquet snapshots).
  *
  * Layout: `statePath/v<batchId>/<table>/pt=<bucket>/...parquet` plus a
  * `MANIFEST` file per version mapping every live `(table, bucket)` to the
  * VERSION whose files hold its current rows. A micro-batch rewrites ONLY
  * the buckets its [[ChangeSet]] keys hash into — untouched buckets stay
  * as pointers into earlier versions — so per-batch write I/O is
  * O(touched buckets), not O(state). When a manifest would span more than
  * `maxChain` live versions, that batch writes a FULL snapshot instead
  * (compaction), bounding both read fan-in and the live-version set; the
  * amortized write cost stays O(batch + state/maxChain).
  *
  * Determinism/idempotence: a redelivered batchId reads the same
  * predecessor manifest, computes the same touched buckets, overwrites the
  * same table dirs and rewrites the same MANIFEST — at-least-once delivery
  * yields exactly-once state. The MANIFEST is written LAST with a
  * terminator line: a version without a complete manifest is an
  * uncommitted crash remnant and is never read.
  */
object StateStore {

  /** @param buckets  hash-partition count per table. Sized so one bucket of
    *                 the LARGEST table fits an executor's write task
    *                 comfortably; at cluster scale this is thousands, here
    *                 32 matches local parallelism.
    * @param maxChain compaction threshold: max live versions a manifest may
    *                 reference before the next write is a full rewrite.
    */
  final case class Config(buckets: Int = 32, maxChain: Int = 8)

  private final case class TableSpec(name: String, schema: StructType, keys: Seq[String])

  private val tables = Seq(
    TableSpec("assets", Schemas.assetSchema, Seq("id")),
    TableSpec("teams", Schemas.teamSchema, Seq("identifier")),
    TableSpec("owns", Schemas.ownsSchema, Seq("team_id", "asset_id")),
    TableSpec("parent_of", Schemas.parentOfSchema, Seq("parent_id", "child_id")))

  private def tableOf(st: State, name: String): DataFrame = name match {
    case "assets" => st.assets
    case "teams" => st.teams
    case "owns" => st.owns
    case "parent_of" => st.parentOf
  }

  private def changesOf(ch: ChangeSet, name: String): DataFrame = name match {
    case "assets" => ch.assets
    case "teams" => ch.teams
    case "owns" => ch.owns
    case "parent_of" => ch.parentOf
  }

  /** Murmur3 bucket of a table's natural key — deterministic across runs
    * and engines versions (Spark's `hash` is seed-42 Murmur3).
    */
  private def bucket(keys: Seq[String], buckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(buckets))

  // --- manifest ------------------------------------------------------------

  /** table -> bucket -> version holding that bucket's files */
  type Manifest = Map[String, Map[Int, Long]]

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(statePath: String, version: Long) =
    new Path(s"$statePath/v$version/MANIFEST")

  /** Plain-text manifest: `buckets=N`, one `table pt version` line per
    * live bucket, `END` terminator (a crash mid-write leaves no END and
    * the version is treated as uncommitted).
    */
  def writeManifest(spark: SparkSession, statePath: String, version: Long,
      cfg: Config, manifest: Manifest): Unit = {
    val (fs, _) = fsFor(spark, statePath)
    val out = fs.create(manifestPath(statePath, version), true)
    try {
      val sb = new StringBuilder
      sb.append(s"buckets=${cfg.buckets}\n")
      for ((t, m) <- manifest.toSeq.sortBy(_._1); (pt, v) <- m.toSeq.sorted)
        sb.append(s"$t $pt $v\n")
      sb.append("END\n")
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
  }

  def readManifest(spark: SparkSession, statePath: String, version: Long): Option[Manifest] = {
    val (fs, _) = fsFor(spark, statePath)
    val p = manifestPath(statePath, version)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").toSeq
    if (!lines.contains("END")) return None // incomplete write
    val entries = lines
      .filter(l => l.nonEmpty && l != "END" && !l.startsWith("buckets="))
      .map { l =>
        val Array(t, pt, v) = l.split(" ")
        (t, pt.toInt, v.toLong)
      }
    Some(entries.groupBy(_._1).map { case (t, es) =>
      t -> es.map(e => e._2 -> e._3).toMap
    })
  }

  /** Committed (manifest-complete) versions <= maxVersion, ascending. */
  def committedVersions(spark: SparkSession, statePath: String, maxVersion: Long): Seq[Long] = {
    val (fs, root) = fsFor(spark, statePath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption)
      .filter(v => v <= maxVersion && fs.exists(manifestPath(statePath, v)))
      .filter(v => readManifest(spark, statePath, v).isDefined)
      .sorted
  }

  // --- write ---------------------------------------------------------------

  /** Write state as version `version`. With a predecessor manifest and a
    * ChangeSet, only buckets containing changed keys are rewritten; the
    * rest inherit the predecessor's pointers. Returns the written manifest.
    */
  def write(spark: SparkSession, statePath: String, version: Long, st: State,
      changes: Option[ChangeSet], cfg: Config = Config()): Manifest = {
    val prev = committedVersions(spark, statePath, version - 1).lastOption
      .flatMap(v => readManifest(spark, statePath, v))

    // touched buckets per table, from the batch's changed keys (driver-side
    // collect of at most `buckets` ints per table)
    val touched: Map[String, Set[Int]] = (prev, changes) match {
      case (Some(_), Some(ch)) =>
        tables.map { t =>
          t.name -> changesOf(ch, t.name)
            .select(bucket(t.keys, cfg.buckets).as("pt")).distinct()
            .collect().map(_.getInt(0)).toSet
        }.toMap
      case _ => tables.map(_.name -> Set.empty[Int]).toMap // forces full write
    }

    val candidate: Manifest = prev match {
      case Some(pm) =>
        tables.map { t =>
          t.name -> (pm.getOrElse(t.name, Map.empty) ++
            touched(t.name).map(_ -> version).toMap)
        }.toMap
      case None => Map.empty
    }
    val chainLen = candidate.values.flatMap(_.values).toSet.size
    val full = prev.isEmpty || changes.isEmpty || chainLen > cfg.maxChain

    val manifest = tables.map { t =>
      val df = tableOf(st, t.name).withColumn("pt", bucket(t.keys, cfg.buckets))
      val dir = s"$statePath/v$version/${t.name}"
      val written: Set[Int] =
        if (full) {
          df.write.mode("overwrite").partitionBy("pt").parquet(dir)
          listBuckets(spark, dir)
        } else if (touched(t.name).isEmpty) Set.empty
        else {
          df.filter(col("pt").isin(touched(t.name).toSeq: _*))
            .write.mode("overwrite").partitionBy("pt").parquet(dir)
          listBuckets(spark, dir)
        }
      // inherit pointers for UNTOUCHED buckets only: a touched bucket that
      // produced no rows this version is now EMPTY and must drop out of
      // the manifest — inheriting its old pointer would resurrect deleted
      // rows on read (latent today — merges never delete — but the
      // ChangeSet contract promises supersets are safe, so honor it)
      val inherited =
        if (full) Map.empty[Int, Long]
        else prev.get.getOrElse(t.name, Map.empty) -- touched(t.name)
      t.name -> (inherited ++ written.map(_ -> version).toMap)
    }.toMap

    writeManifest(spark, statePath, version, cfg, manifest)
    manifest
  }

  private def listBuckets(spark: SparkSession, tableDir: String): Set[Int] = {
    val (fs, p) = fsFor(spark, tableDir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("pt="))
      .flatMap(s => s.getPath.getName.drop(3).toIntOption)
      .toSet
  }

  // --- read ----------------------------------------------------------------

  /** Read the full state at `version` by resolving its manifest pointers.
    * Bucket dirs are read as leaf paths with the canonical schema, so the
    * `pt` column never surfaces.
    */
  def read(spark: SparkSession, statePath: String, version: Long): State = {
    val manifest = readManifest(spark, statePath, version).getOrElse(
      throw new IllegalStateException(s"no committed manifest for v$version under $statePath"))
    def tbl(spec: TableSpec): DataFrame = {
      val paths = manifest.getOrElse(spec.name, Map.empty).toSeq
        .map { case (pt, v) => s"$statePath/v$v/${spec.name}/pt=$pt" }
      if (paths.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], spec.schema)
      else spark.read.schema(spec.schema).parquet(paths: _*)
    }
    State(tbl(tables(0)), tbl(tables(1)), tbl(tables(2)), tbl(tables(3)))
  }

  /** Latest committed state with version <= maxVersion. */
  def readLatest(spark: SparkSession, statePath: String, maxVersion: Long): Option[(Long, State)] =
    committedVersions(spark, statePath, maxVersion).lastOption
      .map(v => (v, read(spark, statePath, v)))

  // --- prune ---------------------------------------------------------------

  /** Delete version dirs that are (a) older than `keepFrom` and (b) not
    * referenced by the manifest of any surviving version. Referenced old
    * versions MUST survive — their files back untouched buckets.
    */
  def prune(spark: SparkSession, statePath: String, keepFrom: Long): Unit = {
    val (fs, root) = fsFor(spark, statePath)
    if (!fs.exists(root)) return
    val all = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption)
    val survivors = all.filter(_ >= keepFrom)
    val referenced = survivors
      .flatMap(v => readManifest(spark, statePath, v))
      .flatMap(_.values.flatMap(_.values))
      .toSet
    all.filterNot(v => v >= keepFrom || referenced.contains(v))
      .foreach(v => fs.delete(new Path(root, s"v$v"), true))
  }
}
