package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{StateStore, TableStore}

/** Persisted, versioned, incrementally-maintained DERIVED TEXT FRAMES —
  * the [[VectorIndex]] lifecycle applied to the text families' two
  * session materializations (the token-occurrence frame feeding the
  * text-analytics queries and the shingle-hash frame feeding the dedup
  * family). A 100 TB corpus tokenizes and shingle-hashes ONCE per
  * corpus generation; every later session LOADS the stored frames
  * (parquet round-trips longs and strings exactly, so consumers are
  * hash-identical through either path), and arrivals maintain the
  * frames incrementally instead of forcing a full re-read of the raw
  * text:
  *
  *  - **document-level delta** (the cheap path): the delta documents
  *    alone are tokenized / shingle-hashed — one projection over the
  *    DELTA, never the corpus — and upserted through [[TableStore]]'s
  *    bucket-level read-modify-write. Because the store key is
  *    `doc_id`, an upsert REPLACES every stored row of a redelivered
  *    document (a shrunken re-edit leaves no stale high-position token
  *    rows behind — row-level upsert could not express that; key-level
  *    replacement does). Write I/O is O(delta × bucket).
  *  - **document-level delete** (the retraction path): a removed
  *    document — a takedown, a GDPR erasure, an upstream tombstone —
  *    rides the same commit as a `deleteDocIds` frame: every stored row
  *    of those doc_ids is retracted through [[TableStore]]'s tombstone
  *    channel, still O(delta × bucket) write I/O, and a doc_id in both
  *    the delta and the deletes survives with the delta's rows
  *    (delete-then-reinsert). No full rewrite for deletions.
  *
  * Correctness contract (the q_triangle_delta proof shape, oracle-gated
  * by `q_token_incremental`): stored base frame ⊕ document-delta
  * derivation is hash-equal to deriving the ENTIRE corpus from raw
  * text — the incremental path loses nothing, including on documents
  * the delta REPLACES.
  *
  * Storage: one [[TableStore]] root per frame (`<root>/text_tokens`,
  * `<root>/text_shingles`) — independent roots because each frame is
  * built and maintained by its own family; both inherit the store's
  * crash contract (writer-unique staging, crc32 manifests, CAS commit,
  * prune-reclaimable garbage, [[StateStore.pinVersion]] retention).
  */
object CorpusIndex {

  val TokenSpec = TableStore.Spec("tokens", Seq("doc_id"))
  val ShingleSpec = TableStore.Spec("shingles", Seq("doc_id"))

  /** Frame rows are a few longs/strings each; 8 buckets at test scale,
    * thousands in production (the StateStore.Config doc).
    */
  def cfg: StateStore.Config = StateStore.Config(buckets = 8)

  def tokensPath(root: String): String = s"$root/text_tokens"
  def shinglesPath(root: String): String = s"$root/text_shingles"

  /** Store root for a corpus dir, keyed by a CONTENT fingerprint of the
    * documents table (path + per-file mtime/size — the
    * [[VectorIndex.storeRootFor]] rationale: the driver regenerates
    * testdata between rounds, and a path-only key would serve a stale
    * frame for new data; production pins the frame to its corpus
    * snapshot version explicitly). The root carries the OS user so two
    * users on one machine never share — or fight over — a
    * world-writable /tmp store (ADVICE r9).
    */
  def storeRootFor(dir: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_text_store_" +
      s"${storeUser}_${fingerprint(dir, "documents.parquet")}"

  /** Path-safe OS user segment for store roots. */
  private[ext] def storeUser: String =
    sys.props.getOrElse("user.name", "nouser").replaceAll("[^A-Za-z0-9_.-]", "_")

  /** Corpus fingerprint through the Hadoop FileSystem API — NOT
    * `java.io.File`, whose mtime/length are 0/0 for any non-local dir
    * (hdfs://, s3a://), which would collapse the key to path-only and
    * silently serve stale persisted frames for a regenerated remote
    * corpus (ADVICE r9). A spark-written table is a DIRECTORY: each
    * child file's (name, length, mtime) participates, so a rewritten
    * part file changes the key. The listing is RECURSIVE (`listFiles(p,
    * true)`, leaf files only): a one-level `listStatus` would credit a
    * partitioned layout (`source=web/part-*.parquet`) through its child
    * DIRECTORY entries, whose (len, mtime) are 0/0 on s3a fake dirs and
    * unchanged on HDFS when a grandchild file is rewritten — an
    * in-place regeneration would then keep the SAME key and serve stale
    * frames, the exact bug this fingerprint exists to close. ONLY a
    * missing ROOT fingerprints as `absent` (nothing to serve either way;
    * its later appearance changes the key): a FileNotFound mid-WALK (a
    * subdir deleted under a concurrent in-place rewrite) and an
    * unreachable filesystem both fail loudly — mapping either to
    * `absent` would key two different corpus generations to the same
    * root, which is exactly the stale-serving bug.
    */
  private[ext] def fingerprint(dir: String, fileName: String): String = {
    import org.apache.hadoop.fs.Path
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(dir, fileName)
    val fs = p.getFileSystem(conf)
    val stOpt = try Some(fs.getFileStatus(p)) catch {
      case _: java.io.FileNotFoundException => None
    }
    val detail = stOpt match {
      case None => "absent"
      case Some(st) if st.isDirectory =>
        // qualify BEFORE deriving the strip base: a relative `dir` would
        // otherwise never match the walk's absolute paths, baking the
        // working directory into the key (two sessions over one corpus
        // would then build disjoint store roots)
        val base = fs.makeQualified(p).toUri.getPath
        val it = fs.listFiles(p, true)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val c = it.next()
          entries += s"${c.getPath.toUri.getPath.stripPrefix(base)}:" +
            s"${c.getLen}:${c.getModificationTime}"
        }
        entries.sorted.mkString(";")
      case Some(st) => s"${st.getLen}:${st.getModificationTime}"
    }
    TextAnalysis.md5hexJvm(s"$dir|$detail").take(16)
  }

  /** The (doc_id, source, term, pos) token rows of `docs` — the single
    * derivation both the full build and the delta path run (so the two
    * paths cannot drift), and the exact frame
    * [[TextAnalysis.corpusTokens]] serves.
    */
  def tokenRows(docs: DataFrame): DataFrame =
    docs
      .repartition(col("doc_id")) // spread the explode — see Dedup.wordShingleDocs
      .select(col("doc_id"), col("source"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .select(col("doc_id"), col("source"), col("term"),
        col("pos").cast("long").as("pos"))

  /** The (doc_id, hs) shingle-hash rows of `docs` — delegates to the
    * dedup family's fused native pass.
    */
  def shingleRows(docs: DataFrame): DataFrame = Dedup.wordShingleDocs(docs)

  // --- tokens --------------------------------------------------------------

  /** Full-write `docs`' token frame as `version`. */
  def buildTokens(spark: SparkSession, root: String, docs: DataFrame,
      version: Long = 0L, cfg: StateStore.Config = CorpusIndex.cfg): Unit =
    writeTokenFrame(spark, root, tokenRows(docs), version, cfg)

  /** Full-write an ALREADY-DERIVED token frame (the session build
    * checkpoints its frame first and persists those exact blocks — no
    * second tokenize pass).
    */
  def writeTokenFrame(spark: SparkSession, root: String, frame: DataFrame,
      version: Long = 0L, cfg: StateStore.Config = CorpusIndex.cfg): Unit =
    TableStore.write(spark, tokensPath(root), version, Seq(TokenSpec),
      Map("tokens" -> frame), cfg = cfg)

  /** Document-level delta: derive ONLY `deltaDocs`' token rows and
    * upsert them as a new version — every stored row of a redelivered
    * doc_id is replaced, untouched buckets inherit their pointers.
    * `deleteDocIds` (a frame holding `doc_id`) retracts removed
    * documents in the same commit — see the object doc's delete bullet.
    */
  def appendTokenDocs(spark: SparkSession, root: String,
      deltaDocs: DataFrame, deleteDocIds: Option[DataFrame] = None,
      cfg: StateStore.Config = CorpusIndex.cfg): Long = {
    val v = latestTokens(spark, root)
    TableStore.write(spark, tokensPath(root), v + 1, Seq(TokenSpec),
      Map("tokens" -> tokenRows(deltaDocs)), delta = true, cfg = cfg,
      deletes = deleteDocIds.map("tokens" -> _.select(col("doc_id"))).toMap)
    v + 1
  }

  def latestTokens(spark: SparkSession, root: String): Long =
    TableStore.latestVersion(spark, tokensPath(root)).getOrElse(
      throw new IllegalStateException(s"no committed token frame under $root"))

  def storedTokens(spark: SparkSession, root: String): DataFrame =
    TableStore.read(spark, tokensPath(root), latestTokens(spark, root), "tokens")

  // --- shingles ------------------------------------------------------------

  /** Full-write `docs`' shingle frame as `version`. */
  def buildShingles(spark: SparkSession, root: String, docs: DataFrame,
      version: Long = 0L): Unit =
    writeShingleFrame(spark, root, shingleRows(docs), version)

  /** Full-write an already-derived shingle frame — see [[writeTokenFrame]]. */
  def writeShingleFrame(spark: SparkSession, root: String, frame: DataFrame,
      version: Long = 0L): Unit =
    TableStore.write(spark, shinglesPath(root), version, Seq(ShingleSpec),
      Map("shingles" -> frame), cfg = cfg)

  /** Document-level delta for the shingle frame — the dedup twin of
    * [[appendTokenDocs]] (one fused hash pass over the delta docs only),
    * with the same `deleteDocIds` retraction channel.
    */
  def appendShingleDocs(spark: SparkSession, root: String,
      deltaDocs: DataFrame, deleteDocIds: Option[DataFrame] = None): Long = {
    val v = latestShingles(spark, root)
    TableStore.write(spark, shinglesPath(root), v + 1, Seq(ShingleSpec),
      Map("shingles" -> shingleRows(deltaDocs)), delta = true, cfg = cfg,
      deletes = deleteDocIds.map("shingles" -> _.select(col("doc_id"))).toMap)
    v + 1
  }

  def latestShingles(spark: SparkSession, root: String): Long =
    TableStore.latestVersion(spark, shinglesPath(root)).getOrElse(
      throw new IllegalStateException(s"no committed shingle frame under $root"))

  // --- streaming maintenance -------------------------------------------------

  /** Keep BOTH stored frames fresh from a document CDC feed — the
    * deployment shape where one upstream change stream (a crawler, a
    * takedown queue, the store's own `graft-store-cdc`) maintains every
    * derived frame downstream. The envelope is
    * `(doc_id, source, text, op, seq)` with `op ∈ {upsert, delete}`;
    * `seq` is the per-doc ordering (offset/event time) — a micro-batch
    * may carry several events for one document and only the LAST one
    * (max seq; delete beats upsert at equal seq) takes effect, exactly
    * the last-writer contract the D3 family pins.
    *
    * Versions are keyed to the micro-batch id (`batchId + 1`, past the
    * v0 full build), so an at-least-once replay recommits its own
    * version from the same predecessor with the same deterministic
    * result — idempotent, the [[graft.streaming.StreamIngest]] contract.
    * The two frames commit independently (a crash between them leaves
    * the roots one version apart; each side's replay converges), and
    * each commit costs O(batch × bucket), never O(corpus).
    */
  def foldDocBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, cfg: StateStore.Config = CorpusIndex.cfg): Unit = {
    // last event per doc: max seq, delete outranking upsert on ties
    val last = batch
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("source"), col("text"), col("op")),
        struct(col("seq"), (col("op") === "delete").cast("int"))).as("r"))
      .select(col("doc_id"), col("r.source"), col("r.text"), col("r.op"))
      .localCheckpoint(true) // one derivation, consumed four times below
    val upserts = last.filter(col("op") =!= "delete")
      .select(col("doc_id"), col("source"), col("text"))
    // a delete with no committed predecessor retracts nothing — drop it
    // rather than trip TableStore's full-write refusal (stream-from-empty
    // bootstrap: batch 0 full-writes its upserts)
    def dels(path: String) =
      if (TableStore.latestVersion(spark, path, batchId).isEmpty) None
      else Some(last.filter(col("op") === "delete").select(col("doc_id")))
    TableStore.write(spark, tokensPath(root), batchId + 1, Seq(TokenSpec),
      Map("tokens" -> tokenRows(upserts)), delta = true, cfg = cfg,
      deletes = dels(tokensPath(root)).map("tokens" -> _).toMap)
    TableStore.write(spark, shinglesPath(root), batchId + 1, Seq(ShingleSpec),
      Map("shingles" -> shingleRows(upserts)), delta = true, cfg = cfg,
      deletes = dels(shinglesPath(root)).map("shingles" -> _).toMap)
  }

  /** [[foldDocBatch]] behind a checkpointed foreachBatch sink. */
  def maintainStream(docs: DataFrame, root: String, checkpointPath: String,
      cfg: StateStore.Config = CorpusIndex.cfg)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldDocBatch(batch.sparkSession, root, batch, batchId, cfg)
      }
      .start()

  def storedShingles(spark: SparkSession, root: String): DataFrame =
    TableStore.read(spark, shinglesPath(root), latestShingles(spark, root),
      "shingles")
}
