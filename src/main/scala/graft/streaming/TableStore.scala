package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import StateStore.{Config, Manifest, Pointers}

/** Generic versioned, hash-bucketed table store — [[StateStore]]'s
  * shadow-paging/manifest/CAS machinery opened up to ARBITRARY table
  * sets, so long-lived derived artifacts (the trained vector indexes,
  * see [[graft.ext.VectorIndex]]) get the same durability contract as
  * the graph state: writer-unique staging dirs promoted under a
  * crc32-checked manifest committed with an exclusive create, bucket
  * pointers inherited across versions, prune-reclaimable garbage.
  *
  * The write model matches the store's append-only reverse index
  * (StateStore.write's `parent_of_idx` path), generalized:
  *
  *  - a FULL write (no `delta`) rewrites every table completely;
  *  - an INCREMENTAL write passes each table's DELTA rows only; the
  *    store hashes the delta keys to their buckets, read-modify-writes
  *    exactly those buckets (old rows whose key is absent from the
  *    delta, union the delta — i.e. key-level upsert), and inherits
  *    every untouched bucket's pointer. Per-version write I/O is
  *    O(delta × bucket), never O(table) — the property that makes
  *    incremental index maintenance viable at 100 TB.
  *
  * Keys are the bucket columns ([[Spec.bucketCols]]): a row replaces
  * the stored row with the same key tuple. Determinism/idempotence
  * inherit from StateStore.commit: a redelivered version recomputes the
  * same buckets and pointer map and commits idempotently; a racing
  * writer loses the manifest CAS retryably.
  */
object TableStore {

  /** One table's contract: its name and the key columns rows are
    * bucketed (and upserted) by.
    */
  final case class Spec(name: String, bucketCols: Seq[String])

  /** Graph-store table names a generic store may not reuse: the manifest
    * records `key:`/`schema:` lines only for NON-graph names (so graph
    * manifests stay byte-stable), which makes a generic table named like
    * a graph table structurally ambiguous — and the SQL catalog
    * ([[graft.sources.StoreCatalog]]) could then never list it.
    */
  val ReservedNames: Set[String] =
    Set("assets", "teams", "owns", "parent_of", "parent_of_idx")

  /** Manifest-format safety: names and key columns are interpolated into
    * the line-oriented manifest (`key:t=c1,c2`, `schema:t={json}`,
    * `t pt v` pointer lines), so a name containing whitespace, '=', ':'
    * or ',' would break — or worse, silently mis-parse — every later
    * read of a successfully committed store. Validated at WRITE time so
    * the failure is loud and immediate (ADVICE r9).
    */
  private[graft] def validateSpecs(specs: Seq[Spec]): Unit = {
    val nameOk = "[A-Za-z0-9_.\\-]+".r
    require(specs.map(_.name).distinct.size == specs.size,
      s"duplicate table names in specs: ${specs.map(_.name).mkString(", ")}")
    specs.foreach { t =>
      require(nameOk.pattern.matcher(t.name).matches() && t.name != "END",
        s"table name '${t.name}' is not manifest-safe: use only " +
          "[A-Za-z0-9_.-] (no whitespace, ':', '=', ',' — the manifest is " +
          "line-oriented) and not the reserved terminator 'END'")
      require(!ReservedNames(t.name),
        s"table name '${t.name}' is reserved for the graph store " +
          s"(${ReservedNames.toSeq.sorted.mkString(", ")})")
      require(t.bucketCols.nonEmpty, s"table '${t.name}' needs key columns")
      t.bucketCols.foreach { c =>
        require(c.nonEmpty && !c.exists(ch =>
            ch == ',' || ch == '=' || ch == '\n' || ch == '\r'),
          s"key column '$c' of '${t.name}' is not manifest-safe: the " +
            "key: line is comma-separated, so ',', '=', and newlines " +
            "cannot appear in a column name")
      }
    }
  }

  /** Write `frames` as `version`. Full when `delta` is absent (or no
    * predecessor exists); incremental otherwise — then each present
    * `frames(name)` must hold ONLY that table's delta rows, and a table
    * absent from `frames` is inherited untouched.
    *
    * `deletes` (incremental only) names key tuples to RETRACT: every
    * stored row whose [[Spec.bucketCols]] tuple appears in
    * `deletes(name)` is dropped from the new version — the tombstone
    * path a key-level upsert alone cannot express (a key with zero
    * surviving rows is simply absent from any delta frame). Deletes ride
    * the same touched-bucket read-modify-write as upserts, so a
    * delete-only commit still costs O(delta × bucket); a bucket that
    * empties loses its pointer entirely. A key present in BOTH the
    * delta frame and `deletes` survives with the delta's rows (deletes
    * apply to the stored base, then the delta upserts — the CDC
    * delete-then-reinsert ordering).
    */
  /** Returns each staged table's per-bucket (content signature, row
    * count) — the write's own observed stats ([[compact]]'s audit rides
    * them instead of re-reading the store; other callers ignore the
    * value).
    */
  def write(spark: SparkSession, statePath: String, version: Long,
      specs: Seq[Spec], frames: Map[String, DataFrame],
      delta: Boolean = false, cfg: Config = Config(),
      deletes: Map[String, DataFrame] = Map.empty): Map[String, Map[Int, (Long, Long)]] = {
    validateSpecs(specs)
    require(frames.keySet.subsetOf(specs.map(_.name).toSet),
      s"frames ${frames.keySet.diff(specs.map(_.name).toSet)} not in specs")
    require(deletes.keySet.subsetOf(specs.map(_.name).toSet),
      s"deletes ${deletes.keySet.diff(specs.map(_.name).toSet)} not in specs")
    val prevVersion = StateStore.latestCommitted(spark, statePath, version - 1)
    val prev = prevVersion.flatMap(v => StateStore.readManifest(spark, statePath, v))
    val incremental = delta && prev.nonEmpty
    prev.foreach { pm =>
      require(!incremental || pm.buckets == cfg.buckets,
        s"bucket count changed (manifest=${pm.buckets}, config=${cfg.buckets}): " +
          "rebucket with a full write instead")
    }
    require(deletes.isEmpty || incremental,
      "deletes need a committed predecessor to retract from — on a full " +
        "write, filter the rows out of the frame instead")
    require(incremental || frames.keySet == specs.map(_.name).toSet,
      "a full write must provide every table's frame " +
        s"(missing ${specs.map(_.name).toSet.diff(frames.keySet).toSeq.sorted.mkString(", ")})")

    // each version records the schema its tables were written under;
    // inherited tables carry the predecessor's recorded schema forward
    val schemas: Map[String, StructType] = specs.map { t =>
      t.name -> frames.get(t.name).map(_.schema)
        .orElse(prev.map(_.schemaOf(t.name)))
        .getOrElse(throw new IllegalArgumentException(
          s"no frame and no predecessor schema for '${t.name}'"))
    }.toMap
    // incremental schema contract (same as StateStore.write): additive
    // only — inherited buckets null-fill added columns under the new
    // read schema; narrowing needs a full rewrite
    if (incremental) for (t <- specs; df <- frames.get(t.name)) {
      val old = prev.get.schemaOf(t.name)
      val missing = old.fields.filterNot(of =>
        df.schema.fields.exists(nf => nf.name == of.name && nf.dataType == of.dataType))
      require(missing.isEmpty,
        s"incremental write narrows '${t.name}': predecessor fields " +
          s"${missing.map(_.name).mkString(", ")} absent or retyped — evolve " +
          "additively, or rewrite with a full write")
    }

    val token = java.util.UUID.randomUUID().toString.take(8)
    val staging = s"$statePath/.staging-v$version-$token"
    // per-table staged bucket stats: pt -> (content signature, row count).
    // The signature is the order-independent sum of per-row hashes over
    // the rows ACTUALLY written (columns in sorted order, so a
    // deterministic redelivery recomputes the identical value from its
    // own staging): the commit CAS's same-content evidence. Pointer maps
    // alone cannot tell redelivery from a DIFFERENT fold racing the same
    // version onto the same bucket set — that case silently dropped the
    // loser's data before r11. r14: computed as an OBSERVED metric of the
    // staging write itself (graft.functions.BucketSig — bit-identical to
    // the r11-r13 decimal read-back fold, BucketSigSpec pins it), so the
    // per-write sig read-back job AND the written-bucket directory
    // listing both collapse into the one write action (guide §1.2 fewer
    // passes; the read-back was fixed per-commit latency at every scale).
    // concurrent: staging runs one thread per table (stageTable below)
    val stagedStats = scala.collection.concurrent.TrieMap.empty[String, Map[Int, (Long, Long)]]
    def writeDir(df: DataFrame, name: String): Set[Int] = {
      // hash functions reject map-typed inputs: sign over the hashable
      // columns only (a table that is ALL maps degrades to the
      // pointer-only comparison instead of refusing schemas the store
      // accepted before r11)
      val dataCols = df.schema.fields
        .filter(f => f.name != "pt" && !StateStore.containsMap(f.dataType))
        .map(_.name).sorted.toSeq.map(col)
      val obs = new org.apache.spark.sql.Observation(s"stage-$name-$token")
      val metric =
        if (dataCols.isEmpty) collect_set(col("pt")).as("pts")
        else graft.functions.BucketSig(col("pt"), xxhash64(dataCols: _*)).as("sigs")
      df.observe(obs, metric)
        .write.mode("overwrite").partitionBy("pt").parquet(s"$staging/$name")
      if (dataCols.isEmpty)
        obs.get("pts").asInstanceOf[scala.collection.Seq[Int]].toSet
      else {
        val stats = obs.get("sigs")
          .asInstanceOf[scala.collection.Map[Int, org.apache.spark.sql.Row]]
          .map { case (pt, r) => pt -> ((r.getLong(0), r.getLong(1))) }.toMap
        // zero-bucket stagings record NO sig entry (the manifest writer
        // emits no lines for them, so an in-memory empty map would make a
        // byte-identical redelivery spuriously fail the sig compare — the
        // exact asymmetry live() normalizes for pointers)
        if (stats.nonEmpty) stagedStats(name) = stats
        stats.keySet
      }
    }
    def provablyNoRows(df: DataFrame): Boolean = df.rdd.getNumPartitions == 0

    // Each table's staging is independent (own staging subdir, own
    // election, own observed stats) and the commit below only runs after
    // EVERY table completes — so multi-table versions stage their tables
    // CONCURRENTLY (guide §2.6: overlap independent jobs so the next
    // action's tasks back-fill the scheduler latency and task tail of the
    // current one). The pool is created per call, so its threads inherit
    // this caller's thread-local job group/description; single-table
    // writes skip the pool entirely.
    def stageTable(t: Spec): (String, Map[Int, Long]) = {
      val keyBucket = StateStore.bucket(t.bucketCols, cfg.buckets)
      val inherited = prev.map(_.pointers.getOrElse(t.name, Map.empty[Int, Long]))
        .getOrElse(Map.empty)
      // retracted key tuples, reduced to the key columns (a frame with
      // extra columns is fine — only the key participates)
      val delKeys: Option[DataFrame] = deletes.get(t.name)
        .filterNot(provablyNoRows)
        .map(_.select(t.bucketCols.map(col): _*).distinct())
      t.name -> ((frames.get(t.name), delKeys) match {
        case (None, None) =>
          inherited // untouched: every bucket pointer carries forward
        case (Some(df), _) if !incremental =>
          if (provablyNoRows(df)) Map.empty[Int, Long]
          else writeDir(df.withColumn("pt", keyBucket), t.name)
            .map(_ -> version).toMap
        case (dfOpt, del) =>
          // the delta frame feeds TWO actions — the bucket election and
          // the merged staging write. r13 measured lazy re-derivation
          // cheaper than an EAGER localCheckpoint (1.74 s vs 2.21 s on
          // q_token_incremental: the checkpoint's blocking block write
          // costs more than a second derivation); r14 gets the single
          // derivation WITHOUT the blocking write with a plain lazy
          // persist — the election job populates the cache, the staging
          // write reads it, and it is released right after staging. The
          // cache is O(delta rows) by the incremental-write contract.
          val cached = dfOpt.filterNot(provablyNoRows)
            .map(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          // every key this commit touches: the delta's keys (upserts —
          // stored rows of these keys are replaced) plus the retracted
          // keys (deletes — stored rows of these keys vanish)
          val touchedKeys = (cached
            .map(_.select(t.bucketCols.map(col): _*).distinct()).toSeq ++ del.toSeq)
            .reduceOption(_.unionByName(_)).map(_.distinct())
          // touched buckets — a bounded driver collect (at most `buckets`
          // ints), the same shape as StateStore's touched-bucket
          // election. Computed from the PRE-distinct key projections at
          // the RDD layer (r13 optimization): buckets of keys == buckets
          // of distinct keys, each branch is then a pure projection, and
          // the RDD distinct+collect is ONE two-stage job — the SQL
          // distinct form paid several AQE stage-jobs of scheduling
          // latency for the same bounded answer (the
          // StateStore.collectBucketsTagged rationale).
          val electionFrames = cached.toSeq ++ del.toSeq
          val touched: Set[Int] = electionFrames
            .map(_.select(keyBucket.as("pt")).rdd.map(_.getInt(0)))
            .reduceOption(_ union _)
            .map(_.distinct(numPartitions = 2).collect().toSet)
            .getOrElse(Set.empty)
          try if (touched.isEmpty) inherited
          else {
            // read-modify-write ONLY the touched buckets: stored rows
            // lose to delta/delete rows on key equality, then the delta
            // rows re-enter (so a key in both survives with the delta's
            // rows — delete-then-reinsert)
            val oldPaths = inherited
              .filter { case (pt, _) => touched(pt) }
              .map { case (pt, v) =>
                s"${StateStore.tableDataDir(statePath, prev.get.dirs, v, t.name)}/pt=$pt"
              }.toSeq
            val old = StateStore.readPaths(spark, prev.get.schemaOf(t.name), oldPaths)
            // null-SAFE key equality (<=>): a plain usingColumns anti-join
            // never matches NULL keys, so a stored null-key row could
            // neither be replaced nor retracted — redelivery would
            // duplicate it and a tombstone would silently no-op while the
            // commit reports success (ADVICE r9). distinct() upstream
            // already treats nulls as equal, so <=> is the consistent leg.
            val tk = touchedKeys.get
            val kept = old.join(tk,
              t.bucketCols.map(c => old(c) <=> tk(c)).reduce(_ && _), "left_anti")
            val merged = cached.fold(kept)(kept.unionByName(_, allowMissingColumns = true))
              .withColumn("pt", keyBucket)
              .filter(col("pt").isin(touched.toSeq: _*))
            val written = writeDir(merged, t.name)
            // a bucket every row left simply writes nothing: its pointer
            // drops here rather than pointing at an empty dir
            (inherited -- touched) ++ written.map(_ -> version).toMap
          } finally cached.foreach(_.unpersist(blocking = false))
      })
    }
    val pointers: Pointers =
      if (specs.size == 1) Map(stageTable(specs.head))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(specs.size, 4))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(specs)(t =>
            scala.concurrent.Future(stageTable(t))),
          scala.concurrent.duration.Duration.Inf).toMap
        finally pool.shutdown()
      }

    val refVers = pointers.valuesIterator.flatMap(_.valuesIterator).toSet
    val dirs: Map[Long, String] =
      prev.map(_.dirs).getOrElse(Map.empty).filter { case (v, _) => refVers(v) } ++
        (if (refVers(version)) Map(version -> s"d-$token") else Map.empty)
    StateStore.commit(spark, statePath, version, cfg, pointers, prevVersion,
      Some(staging), schemas, dirs, dirName = s"d-$token",
      // record each table's key columns: the manifest alone then fully
      // describes this store to the DSv2/catalog read path
      keys = specs.map(t => t.name -> t.bucketCols).toMap,
      sigs = stagedStats.view.mapValues(_.map { case (pt, (s, _)) => pt -> s }).toMap)
    stagedStats.toMap
  }

  /** One table at `version`, resolved through its manifest pointers and
    * recorded schema (the `pt` partition column never surfaces).
    */
  def read(spark: SparkSession, statePath: String, version: Long,
      table: String): DataFrame = {
    val m = manifestAt(spark, statePath, version)
    StateStore.readPaths(spark, m.schemaOf(table),
      StateStore.bucketPaths(statePath, m, table))
  }

  /** Bucket-pruned point read: only the buckets the `keys` frame hashes
    * into are opened — the read twin of the incremental write.
    */
  def readForKeys(spark: SparkSession, statePath: String, version: Long,
      spec: Spec, keys: DataFrame): DataFrame = {
    val m = manifestAt(spark, statePath, version)
    val touched = keys
      .select(StateStore.bucket(spec.bucketCols, m.buckets).as("pt"))
      .distinct().collect().map(_.getInt(0)).toSet
    StateStore.readPaths(spark, m.schemaOf(spec.name),
      StateStore.bucketPaths(statePath, m, spec.name, Some(touched)))
  }

  def latestVersion(spark: SparkSession, statePath: String,
      maxVersion: Long = Long.MaxValue): Option[Long] =
    StateStore.latestCommitted(spark, statePath, maxVersion)

  /** Row-level diff of one table between two committed versions —
    * [[StateStore.diffVersions]] generalized to any store: only the
    * buckets whose pointers differ are read (O(changed), not O(table)),
    * and the result carries a `change` column (`added`/`removed`; an
    * updated row appears as both). The audit/debug face of incremental
    * maintenance: what did this maintenance commit actually change?
    */
  /** Across a [[rebucket]] boundary (unequal moduli) the diff is still
    * EXACT and minimal — the row-level exceptAll is computed globally
    * over all changed buckets, so bucket ids never enter the comparison
    * — but it degrades to a full read of both versions: a rebucket
    * rewrites every pointer, so pointer pruning keeps nothing. One
    * O(table) audit read per rebucket, same order as the rebucket write
    * itself (contract pinned by TableStoreSpec's rebucket-diff leg).
    */
  def diff(spark: SparkSession, statePath: String, table: String,
      vOld: Long, vNew: Long): DataFrame = {
    val mOld = manifestAt(spark, statePath, vOld)
    val mNew = manifestAt(spark, statePath, vNew)
    StateStore.diffTable(spark, statePath, table, vOld, mOld, vNew, mNew)._1
  }

  /** Re-bucket the store: full-write every table of the latest version
    * under `cfg`'s (different) bucket count as the next version. THE
    * growth path when a corpus outgrows its bucket sizing (the Config
    * contract keeps one bucket batch-sized, so 100× the corpus wants
    * more buckets): incremental writes refuse a modulus change loudly,
    * and this is the documented full-rewrite answer — one corpus-scale
    * pass, after which deltas resume at the new modulus. Old versions
    * stay readable under their own modulus (the manifest records it);
    * returns the new version.
    */
  def rebucket(spark: SparkSession, statePath: String, specs: Seq[Spec],
      cfg: Config): Long = {
    val v = latestVersion(spark, statePath).getOrElse(
      throw new IllegalStateException(s"no committed version under $statePath"))
    val frames = specs.map(t => t.name -> read(spark, statePath, v, t.name)).toMap
    write(spark, statePath, v + 1, specs, frames, cfg = cfg)
    v + 1
  }

  /** Order-independent content signature of a whole table — the audit
    * half of [[compact]]: the same sum-of-row-hashes fold the per-bucket
    * commit signatures use, over EVERY column in sorted order, so
    * byte-movement (coalescing, re-laying-out files) that preserves the
    * row multiset preserves the signature. Map-typed columns (which
    * `xxhash64` cannot hash) are signed through a canonical string
    * rendering instead of being dropped (ADVICE r12: an all-map table
    * previously signed a vacuous constant 0): a compaction only MOVES
    * rows — the parquet round-trip preserves each map's stored entry
    * order — so the rendering is deterministic across the rewrite, and
    * corruption confined to a map column now fails the audit.
    */
  /** Whole-table content signature plus row count for SEVERAL tables in
    * ONE action (r13 optimization — compact's audit previously paid one
    * sig job plus one count job per table): each table contributes one
    * aggregated row tagged with its name, the tagged aggregates union
    * into a single collect. The signature is the same sum-of-row-hashes
    * fold the per-bucket commit signatures use, over EVERY column in
    * sorted name order (map-typed columns through a canonical string
    * rendering — ADVICE r12), so byte movement that preserves the row
    * multiset preserves it.
    */
  private def tableSigCounts(frames: Seq[(String, DataFrame)]): Map[String, (Long, Long)] = {
    val perTable = frames.map { case (name, df) =>
      val cols = df.schema.fields.sortBy(_.name).map { f =>
        if (StateStore.containsMap(f.dataType)) col(f.name).cast("string")
        else col(f.name)
      }
      val sig =
        if (cols.isEmpty) lit(0L)
        else coalesce(pmod(sum(xxhash64(cols: _*).cast("decimal(38,0)")),
          lit(Long.MaxValue).cast("decimal(38,0)")).cast("long"), lit(0L))
      df.agg(sig.as("sig"), count(lit(1)).as("rows"))
        .select(lit(name).as("t"), col("sig"), col("rows"))
    }
    if (perTable.isEmpty) Map.empty
    else perTable.reduce(_.unionByName(_)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  /** (file count, byte total) of one table's live buckets at `version` —
    * manifest-pointer listing only, no data pages.
    */
  private def fileCensus(spark: SparkSession, statePath: String,
      m: Manifest, table: String): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    var files = 0L
    var bytes = 0L
    m.pointers.getOrElse(table, Map.empty).foreach { case (pt, pv) =>
      val p = new org.apache.hadoop.fs.Path(
        s"${StateStore.tableDataDir(statePath, m.dirs, pv, table)}/pt=$pt")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.listStatus(p).filter(_.isFile).foreach { f =>
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Audited compaction — the space-reclaim operation a long-lived store
    * needs (SURVEY §2 A4's named residual): incremental maintenance
    * leaves each touched bucket as several small parquet files per
    * version, and retention keeps whole version dirs alive. One call
    *
    *   1. rewrites the LATEST version's tables as a new full version
    *      with ONE file per bucket (the frame is pre-partitioned by the
    *      store's own bucket hash, so `partitionBy("pt")` emits exactly
    *      one file per live bucket),
    *   2. verifies content equality before/after through the
    *      order-independent content signature — a compaction that loses or
    *      duplicates a row fails LOUDLY, and before failing the old
    *      content is re-committed as the next head so readers never
    *      serve the content-wrong version,
    *   3. prunes every version below the new head — reader pins still
    *      floor the reclaim ([[StateStore.pinVersion]]), so a pinned old
    *      version survives with its data intact.
    *
    * Returns the audit report, one row per table: rows, files and bytes
    * before/after, version counts before/after, and the signature
    * verdict. Crash-safe by construction: the rewrite is an ordinary
    * CAS-committed write (a crash before commit leaves the old head
    * live; after commit, re-running prune is idempotent).
    */
  def compact(spark: SparkSession, statePath: String, specs: Seq[Spec],
      cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val v = latestVersion(spark, statePath).getOrElse(
      throw new IllegalStateException(s"no committed version under $statePath"))
    val versionsBefore = StateStore.committedVersions(spark, statePath, Long.MaxValue).size
    val mBefore = manifestAt(spark, statePath, v)
    // A table live in the head manifest but missing from `specs` would be
    // dropped from the rebuilt manifest and its data then irreversibly
    // deleted by the prune below — refuse a partial spec list loudly
    // instead of silently losing data (ADVICE r12).
    val live = mBefore.pointers.keySet ++ mBefore.schemas.keySet ++ mBefore.keys.keySet
    val omitted = live.diff(specs.map(_.name).toSet)
    require(omitted.isEmpty,
      s"compact specs omit live table(s) ${omitted.toSeq.sorted.mkString(", ")} " +
        s"of $statePath v$v: compacting a partial spec list would drop them " +
        "from the new head and prune their data — pass every live table")
    val before = specs.map(t => t.name -> fileCensus(spark, statePath, mBefore, t.name)).toMap
    // BEFORE-signature per table, derived from the COMMITTED per-bucket
    // sig: lines instead of a full-store read (r14, guide §6/§1.2 — the
    // audit previously read every table once for the before-sig, once
    // inside the rewrite and once for the after-sig; now the rewrite is
    // the only data read). Each live pointer (pt -> pv) looks up its sig
    // in pv's manifest; the whole-table value is the modular fold of the
    // bucket residues (the sig is a sum mod Long.MaxValue, so per-bucket
    // folds compose exactly — BucketSig's contract). Valid only when
    // every live bucket carries a sig AND was staged under the head's
    // hashable column set (an additively-evolved table's old buckets
    // signed fewer columns); tables that fail either condition — and
    // map-typed tables, whose legacy audit signs a canonical string
    // rendering the commit sigs exclude — keep the r13 full-read compare.
    val manifestCache = scala.collection.mutable.Map(v -> mBefore)
    def mAt(pv: Long): Manifest =
      manifestCache.getOrElseUpdate(pv, manifestAt(spark, statePath, pv))
    def dataColsOf(sc: StructType): Seq[String] = sc.fields
      .filter(f => f.name != "pt" && !StateStore.containsMap(f.dataType))
      .map(_.name).sorted.toSeq
    val M = BigInt(Long.MaxValue)
    def sigBeforeFromManifests(t: Spec): Option[Long] = {
      val headCols = dataColsOf(mBefore.schemaOf(t.name))
      if (headCols.size != mBefore.schemaOf(t.name).fields.count(_.name != "pt"))
        return None // map-typed column: legacy audit signs it, commit sigs don't
      val ptrs = mBefore.pointers.getOrElse(t.name, Map.empty[Int, Long])
      val sigs = ptrs.toSeq.map { case (pt, pv) =>
        val m = mAt(pv)
        if (dataColsOf(m.schemaOf(t.name)) != headCols) None
        else m.sigs.getOrElse(t.name, Map.empty).get(pt)
      }
      if (sigs.exists(_.isEmpty)) None
      else Some((sigs.flatten.map(BigInt(_)).sum mod M).toLong)
    }
    val fastBefore: Map[String, Option[Long]] =
      specs.map(t => t.name -> sigBeforeFromManifests(t)).toMap
    // legacy full-read compare for the tables the fast path cannot cover
    val slowTables = specs.filter(t => fastBefore(t.name).isEmpty)
    val scBefore = tableSigCounts(
      slowTables.map(t => t.name -> read(spark, statePath, v, t.name)))
    val frames = specs.map { t =>
      val kb = StateStore.bucket(t.bucketCols, cfg.buckets)
      // one partition per bucket hash → exactly one parquet file per pt dir
      t.name -> read(spark, statePath, v, t.name).repartition(cfg.buckets, kb)
    }.toMap
    val staged = write(spark, statePath, v + 1, specs, frames, cfg = cfg)
    val mAfter = manifestAt(spark, statePath, v + 1)
    def stagedFold(name: String): Long =
      (staged.getOrElse(name, Map.empty).values.map(p => BigInt(p._1)).sum mod M).toLong
    val scAfterSlow = tableSigCounts(
      slowTables.map(t => t.name -> read(spark, statePath, v + 1, t.name)))
    val sigBefore = specs.map(t => t.name ->
      fastBefore(t.name).getOrElse(scBefore(t.name)._1)).toMap
    val sigAfter = specs.map(t => t.name ->
      (if (fastBefore(t.name).isDefined) stagedFold(t.name)
       else scAfterSlow(t.name)._1)).toMap
    // rows: the audit reports on SUCCESS only, where content equality
    // makes before-rows == staged-rows; the fallback tables carry their
    // own counted value
    val rowsBefore = specs.map(t => t.name ->
      (if (fastBefore(t.name).isDefined)
        staged.getOrElse(t.name, Map.empty).values.map(_._2).sum
       else scBefore(t.name)._2)).toMap
    val bad = specs.filter(t => sigAfter(t.name) != sigBefore(t.name))
    if (bad.nonEmpty) {
      // v+1 is already committed, so readers of latestVersion would serve
      // the content-wrong compaction until an operator intervened (ADVICE
      // r12). Roll the head forward to the known-good content FIRST: v's
      // data is still on disk (prune has not run), so re-commit it as
      // v+2, then fail loudly. The head is never left content-wrong.
      val restore = specs.map(t => t.name -> read(spark, statePath, v, t.name)).toMap
      write(spark, statePath, v + 2, specs, restore, cfg = cfg)
      throw new IllegalStateException(
        s"compaction under $statePath changed content of " +
          bad.map(t => s"'${t.name}' (sig ${sigBefore(t.name)} -> ${sigAfter(t.name)})")
            .mkString(", ") +
          s": content-wrong v${v + 1} was quarantined by re-committing " +
          s"v$v's content as the new head v${v + 2}; nothing was pruned — " +
          "investigate the compaction rewrite")
    }
    val report = specs.map { t =>
      val (fa, ba) = fileCensus(spark, statePath, mAfter, t.name)
      (t.name, rowsBefore(t.name), before(t.name)._1, fa, before(t.name)._2, ba)
    }
    // reclaim below the new head; reader pins still floor this
    StateStore.prune(spark, statePath, keepFrom = v + 1)
    val versionsAfter = StateStore.committedVersions(spark, statePath, Long.MaxValue).size
    report.toDF("table", "rows", "files_before", "files_after",
        "bytes_before", "bytes_after")
      .withColumn("versions_before", lit(versionsBefore.toLong))
      .withColumn("versions_after", lit(versionsAfter.toLong))
      .withColumn("sig_ok", lit(true))
  }

  /** Operator-facing store census, driver-side from manifests + file
    * listings alone (no data pages): one row per (version, table) with
    * the live bucket count, how many of those buckets this version
    * actually rewrote (vs inherited), and the live bytes resolved
    * through the pointer chase. Two store-level census columns (repeated
    * on every row) total bytes NO committed manifest references:
    * `orphan_bytes` counts PROMOTED dirs whose commit lost the CAS or
    * crashed before its manifest — definitely-dead remnants prune will
    * reclaim, so a growing value is leak pressure an operator should
    * see BEFORE prune (VERDICT r9 #6); `staging_bytes` counts
    * `.staging-*` dirs separately, because without a clock the census
    * cannot tell a crashed writer's leftovers from a LIVE in-flight
    * write — polling `describe` during a large write WILL see
    * `staging_bytes` rise by the write's size and must not read that as
    * a leak (it either promotes into the next commit or becomes
    * prune-reclaimable); only a value that persists across quiet periods
    * is remnant pressure. Bounded by versions × tables × buckets FS
    * metadata calls plus one recursive root listing — an ops query, not
    * a data-path one.
    */
  def describe(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val census = for {
      v <- StateStore.committedVersions(spark, statePath, Long.MaxValue)
      m <- StateStore.readManifest(spark, statePath, v).toSeq
    } yield (v, m)
    val rows = for {
      (v, m) <- census
      table <- (m.pointers.keySet ++ m.schemas.keySet ++ m.keys.keySet).toSeq.sorted
    } yield {
      val ptrs = m.pointers.getOrElse(table, Map.empty)
      val bytes = ptrs.map { case (pt, pv) =>
        val p = new org.apache.hadoop.fs.Path(
          s"${StateStore.tableDataDir(statePath, m.dirs, pv, table)}/pt=$pt")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) 0L
        else fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
      }.sum
      (v, table, m.buckets, ptrs.size, ptrs.count(_._2 == v), bytes)
    }
    val (orphans, staging) = orphanBytes(spark, statePath, census)
    rows.toDF("version", "table", "buckets", "live_buckets",
        "buckets_written_here", "live_bytes")
      .withColumn("orphan_bytes", lit(orphans))
      .withColumn("staging_bytes", lit(staging))
  }

  /** (orphan, staging) bytes under `statePath` referenced by no committed
    * manifest: every file not inside a pointer-referenced `pt=` dir and
    * not store metadata (MANIFEST files, `pins/`). Files under a
    * `.staging-*` dir are tallied separately — they may belong to a LIVE
    * writer, not a crash (see [[describe]]). Driver-side recursive
    * listing — same cost class as prune's own sweep.
    */
  private def orphanBytes(spark: SparkSession, statePath: String,
      census: Seq[(Long, StateStore.Manifest)]): (Long, Long) = {
    val (fs, root) = StateStore.fsFor(spark, statePath)
    if (!fs.exists(root)) return (0L, 0L)
    val qualifiedRoot = fs.makeQualified(root).toString
    def qualify(s: String): String =
      fs.makeQualified(new org.apache.hadoop.fs.Path(s)).toString
    val referenced: Set[String] = (for {
      (_, m) <- census.iterator
      (table, ptrs) <- m.pointers.iterator
      (pt, pv) <- ptrs.iterator
    } yield qualify(
      s"${StateStore.tableDataDir(statePath, m.dirs, pv, table)}/pt=$pt")).toSet
    // committer marker files (_SUCCESS; on object-store committers,
    // non-empty JSON markers) are written directly under the table data
    // dir, NOT under any pt= dir — every committed version would
    // otherwise add persistent phantom orphan_bytes that reads as leak
    // pressure across quiet periods. A referenced table dir's
    // underscore-prefixed files are store metadata, not orphans.
    val referencedTableDirs: Set[String] =
      referenced.map(p => new org.apache.hadoop.fs.Path(p).getParent.toString)
    val it = fs.listFiles(root, true)
    val pinsPrefix = s"$qualifiedRoot/pins/"
    val stagingPrefix = s"$qualifiedRoot/.staging-"
    var orphan = 0L
    var staging = 0L
    while (it.hasNext) {
      val f = it.next()
      val fp = f.getPath.toString
      val marker = f.getPath.getName.startsWith("_") &&
        referencedTableDirs.contains(f.getPath.getParent.toString)
      val meta = f.getPath.getName == "MANIFEST" || marker ||
        fp.startsWith(pinsPrefix)
      // a file is live iff some ANCESTOR dir is a referenced pt= dir
      // (parquet writes files directly under the pt dir, but walking up
      // keeps this robust to nested layouts) — O(depth) set probes per
      // file, never O(refs)
      var anc = f.getPath.getParent
      var live = false
      while (!live && anc != null && anc.toString.length >= qualifiedRoot.length) {
        live = referenced.contains(anc.toString)
        anc = anc.getParent
      }
      if (!meta && !live) {
        if (fp.startsWith(stagingPrefix)) staging += f.getLen
        else orphan += f.getLen
      }
    }
    (orphan, staging)
  }

  private def manifestAt(spark: SparkSession, statePath: String,
      version: Long): Manifest =
    StateStore.readManifest(spark, statePath, version).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest for v$version under $statePath"))
}
