package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.QueryDef

/** Delta Lake transaction log — the open table-format protocol
  * (delta-io PROTOCOL.md) a lakehouse corpus actually sits behind.
  * `_delta_log/` holds one JSON-lines commit per version
  * (`%020d.json`: `protocol` / `metaData` / `add` / `remove` actions),
  * a parquet CHECKPOINT of the net state every N commits
  * (`%020d.checkpoint.parquet`) and the `_last_checkpoint` pointer.
  * A reader reconstructs a snapshot by loading the checkpoint and
  * REPLAYING the commits after it: per file path, the latest action
  * wins — a path is live iff its newest action is an `add`.
  *
  * This module builds a real table (data files written by
  * [[ParquetLite]], our own spec-conformant parquet writer — the same
  * files parquet-mr reads, ParquetSpec-pinned), writes the commit
  * schedule add → remove → RE-ADD (so latest-wins replay is genuinely
  * exercised, not just set difference), checkpoints mid-history, and
  * then reconstructs the snapshot SPARK-FIRST: `spark.read.text` +
  * `from_json` over the post-checkpoint commits, a union with the
  * checkpoint parquet, one window per path for latest-action-wins, and
  * a parquet scan of exactly the live files. An unsupported
  * `protocol.minReaderVersion`, a missing commit file in the replay
  * range, or a checkpoint pointer to a missing file each fail LOUDLY —
  * the protocol's own rule (a reader that guesses serves a corrupt
  * snapshot).
  *
  * Scale shape: log replay touches only the ACTION stream (KB-scale per
  * commit, one window over paths — never the data); the data scan reads
  * exactly the live files. At 100 TB the log is the same size; this is
  * precisely why the format exists.
  */
object DeltaLog {

  private val DocsPerFile = 50L

  private def pad20(v: Long): String = f"$v%020d"
  private def partPath(fid: Long): String = f"part-$fid%05d.parquet"

  // ---- action schema (the PROTOCOL.md subset we write and read) ---------------

  private val addType = new StructType()
    .add("path", StringType).add("size", LongType)
    .add("modificationTime", LongType).add("dataChange", BooleanType)
  private val removeType = new StructType()
    .add("path", StringType).add("deletionTimestamp", LongType)
    .add("dataChange", BooleanType)
  private val protocolType = new StructType()
    .add("minReaderVersion", IntegerType).add("minWriterVersion", IntegerType)
  private val metaDataType = new StructType()
    .add("id", StringType).add("schemaString", StringType)
  private val actionType = new StructType()
    .add("add", addType).add("remove", removeType)
    .add("protocol", protocolType).add("metaData", metaDataType)

  // ---- build: a real delta table with an add → remove → re-add history --------

  /** Write the table: data files via our parquet writer, commits v0..v3,
    * a checkpoint at v2, `_last_checkpoint`. Deterministic given the
    * input frame. Returns the table directory.
    *
    * Schedule (fid = doc_id div DocsPerFile):
    *  - v0: protocol + metaData + add every even fid
    *  - v1: add every odd fid
    *  - v2: remove fid % 5 == 1  (checkpoint written AT v2)
    *  - v3: remove fid % 5 == 3, RE-ADD fid % 10 == 1
    * Live = fid % 5 notin {1,3} OR fid % 10 == 1 (latest action wins).
    */
  def buildTable(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    // one parquet file per fid group, written distributed by our writer;
    // the returned manifest is bounded by the file count (corpus/50)
    val files = docs
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $DocsPerFile")))
      .groupBy(expr(s"doc_id div $DocsPerFile").as("fid"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2")))).as("rows"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (fid, rows) =>
        val bytes = ParquetLite.write(rows.map { case (id, t) => (id, t.getBytes(UTF_8)) })
        val path = partPath(fid)
        Files.write(Paths.get(dir, path), bytes)
        (fid, path, bytes.length.toLong)
      }
      .collect().sortBy(_._1)

    def addJson(path: String, size: Long) =
      s"""{"add":{"path":"$path","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}"""
    def removeJson(path: String) =
      s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""
    val protocolJson = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val schemaString =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"doc_id\",\"type\":\"long\",\"nullable\":false,\"metadata\":{}},{\"name\":\"text\",\"type\":\"string\",\"nullable\":false,\"metadata\":{}}]}"""
    val metaDataJson =
      s"""{"metaData":{"id":"graft-delta","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":[],"configuration":{},"createdTime":0}}"""

    def writeCommit(version: Long, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, "_delta_log", pad20(version) + ".json"),
        lines.mkString("", "\n", "\n").getBytes(UTF_8))

    val even = files.filter(_._1 % 2 == 0)
    val odd = files.filter(_._1 % 2 == 1)
    val rm2 = files.filter(_._1 % 5 == 1)
    val rm3 = files.filter(_._1 % 5 == 3)
    val readd3 = files.filter(_._1 % 10 == 1)
    writeCommit(0L, Seq(protocolJson, metaDataJson) ++
      even.map { case (_, p, s) => addJson(p, s) })
    writeCommit(1L, odd.map { case (_, p, s) => addJson(p, s) }.toSeq)
    writeCommit(2L, rm2.map { case (_, p, _) => removeJson(p) }.toSeq)
    writeCommit(3L, rm3.map { case (_, p, _) => removeJson(p) }.toSeq ++
      readd3.map { case (_, p, s) => addJson(p, s) })

    // checkpoint AT v2: net state after commits 0..2 — protocol, metaData,
    // live adds, and the v2 remove tombstones (the spec's layout)
    val liveAt2 = files.filter(f => f._1 % 5 != 1)
    val cpRows =
      Seq(s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        metaDataJson) ++
        liveAt2.map { case (_, p, s) => addJson(p, s) } ++
        rm2.map { case (_, p, _) => removeJson(p) }
    val cpDf = spark.createDataset(cpRows.toSeq)
      .select(from_json(col("value"), actionType).as("a"))
      .select(col("a.add").as("add"), col("a.remove").as("remove"),
        col("a.protocol").as("protocol"), col("a.metaData").as("metaData"))
    // the protocol's checkpoint is ONE parquet file, not a directory:
    // write via Spark into a staging dir, then move the single part file
    val staging = s"$dir/_delta_log/.cp_staging"
    cpDf.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.endsWith(".crc"))
    require(part.length == 1, s"checkpoint staging wrote ${part.length} part files")
    Files.move(Paths.get(part(0)),
      Paths.get(dir, "_delta_log", pad20(2L) + ".checkpoint.parquet"))
    Files.walk(Paths.get(staging)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      s"""{"version":2,"size":${cpRows.size}}""".getBytes(UTF_8))
  }

  // ---- the operator: snapshot reconstruction ----------------------------------

  /** Reconstruct the latest snapshot: `_last_checkpoint` → checkpoint
    * parquet → replay later JSON commits → latest-action-wins per path.
    * Returns (snapshot version, live adds frame `(path, size)`).
    */
  def snapshot(spark: SparkSession, dir: String): (Long, DataFrame) = {
    val lcPath = Paths.get(dir, "_delta_log", "_last_checkpoint")
    require(Files.exists(lcPath), s"delta log at $dir has no _last_checkpoint")
    val lc = Safetensors.parseJson(0L, Files.readString(lcPath, UTF_8).trim, 0L) match {
      case o: Safetensors.JObj => o
      case _ => throw new IllegalArgumentException(s"_last_checkpoint at $dir is not a JSON object")
    }
    val cpVersion = lc.get("version") match {
      case Some(Safetensors.JNum(v)) => v
      case _ => throw new IllegalArgumentException(s"_last_checkpoint at $dir has no integer version")
    }
    val cpFile = s"$dir/_delta_log/${pad20(cpVersion)}.checkpoint.parquet"
    require(Files.exists(Paths.get(cpFile)), s"checkpoint $cpFile named by _last_checkpoint is missing")
    val cp = spark.read.schema(actionType).parquet(cpFile)
      .withColumn("version", lit(cpVersion))

    // commits after the checkpoint: contiguous versions until the first gap
    var v = cpVersion + 1
    val laterVersions = Seq.newBuilder[Long]
    while (Files.exists(Paths.get(dir, "_delta_log", pad20(v) + ".json"))) {
      laterVersions += v
      v += 1
    }
    val later = laterVersions.result()
    val actions = later.foldLeft(cp) { (acc, ver) =>
      acc.unionByName(
        spark.read.text(s"$dir/_delta_log/${pad20(ver)}.json")
          .select(from_json(col("value"), actionType).as("a"))
          .select(col("a.add").as("add"), col("a.remove").as("remove"),
            col("a.protocol").as("protocol"), col("a.metaData").as("metaData"))
          .withColumn("version", lit(ver)))
    }
    // protocol gate: a reader MUST refuse versions it does not implement
    val minReader = actions.select(max(col("protocol.minReaderVersion"))).first().get(0)
    minReader match {
      case null => throw new IllegalArgumentException(s"delta log at $dir carries no protocol action")
      case n: Integer if n > 1 => throw new IllegalArgumentException(
        s"delta table requires minReaderVersion $n; this reader implements 1")
      case _ =>
    }
    // latest-action-wins per path (the spec guarantees at most one action
    // per path per version)
    val perPath = actions
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.path").isNotNull.as("is_add"), col("add.size").as("size"),
        col("version"))
      .where(col("path").isNotNull)
    val w = Window.partitionBy(col("path")).orderBy(col("version").desc)
    val live = perPath
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("is_add"))
      .select(col("path"), col("size"))
    val snapshotVersion = if (later.nonEmpty) later.max else cpVersion
    (snapshotVersion, live)
  }

  // ---- the oracle-gated query --------------------------------------------------

  /** Build the table, reconstruct the snapshot, scan exactly the live
    * files, and emit one row per live document with its file path and
    * the snapshot version — all closed-form for the oracle (the commit
    * schedule is arithmetic on `doc_id div 50`).
    */
  val q_delta_snapshot: QueryDef = QueryDef(
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS text_len,
       |  md5(text) AS text_md5,
       |  'part-' || lpad(CAST(doc_id // $DocsPerFile AS VARCHAR), 5, '0') || '.parquet' AS path,
       |  CAST(doc_id // $DocsPerFile AS BIGINT) AS file_id,
       |  CAST(3 AS BIGINT) AS version
       |FROM documents
       |WHERE ((doc_id // $DocsPerFile) % 5 NOT IN (1, 3))
       |   OR ((doc_id // $DocsPerFile) % 10 = 1)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_delta_${java.util.UUID.randomUUID()}"
    buildTable(s, Tables.documents(s, dir), out)
    val (version, live) = snapshot(s, out)
    val livePaths = live.select(col("path")).collect().map(_.getString(0)).sorted
    if (livePaths.isEmpty)
      // an empty table snapshots to an empty frame, not a scan of no files
      Seq.empty[(Long, Long, String, String, Long, Long)]
        .toDF("doc_id", "text_len", "text_md5", "path", "file_id", "version")
    else
      // schema pinned (the table's metaData action declares it, and every
      // data file is ours): skips footer-inference over ~300 tiny files —
      // a driver-side pass per snapshot read (guide §6)
      s.read.schema("doc_id BIGINT, text STRING")
        .parquet(livePaths.map(p => s"$out/$p"): _*)
        .withColumn("path", regexp_extract(input_file_name(), "part-\\d{5}\\.parquet", 0))
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("text_len"),
          md5(col("text")).as("text_md5"),
          col("path"),
          expr(s"doc_id div $DocsPerFile").as("file_id"),
          lit(version).as("version"))
        .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_delta_snapshot" -> q_delta_snapshot)
}
