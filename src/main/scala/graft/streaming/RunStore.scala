package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared append-only run-directory store for streaming indexes
  * ([[StreamDedup]], [[StreamVecDedup]]): one overwrite-idempotent
  * parquet dir per micro-batch plus SIZE-TIERED compaction, so reads are
  * invariant under when compaction runs and read fan-in stays O(log) in
  * stream age.
  *
  * One readable run is a per-batch `b<id>` dir (weight 1) or a compacted
  * `c<id>_<n>_<g>` dir holding the merged content of `n` original
  * batches with max batch id `id` (`g` = the batchId whose compaction
  * produced it, which makes names unique across crashed retries).
  * `weight` is the run's LOGICAL size — the number of source batches it
  * holds — which tracks bytes for a steady stream and, unlike file
  * sizes, is exact, free to obtain, and deterministic in tests.
  *
  * SIZE-TIERED policy: runs group into tiers by log4(weight); when the
  * lowest tier accumulates `minMerge` runs, ONLY those similar-sized
  * runs merge into one run of the next tier (one merge per call —
  * cascades complete over subsequent batches). A merge never touches the
  * big consolidated runs until enough same-sized siblings exist, so a
  * single compaction reads O(minMerge * tier-size), never the full
  * accumulated state, and each row is rewritten O(log4(corpus/batch))
  * times total.
  *
  * Crash-safety ordering — LOSS is impossible, only duplicates (which
  * consumers absorb: candidate `distinct`, per-key dedup, max_by):
  * source dirs are deleted ONLY AFTER the merged dir is fully in place
  * under its final readable name. A crash before the rename leaves every
  * source intact (the tmp name is never read); a crash after it leaves
  * the target plus some sources — duplicate rows, no loss. A retry of
  * the SAME batch over the SAME surviving sources recomputes the same
  * target name with identical content (safe overwrite); a retry after a
  * partial source delete computes a smaller weight → a fresh name, and
  * the stale target survives as an extra run (duplicates, no loss).
  */
private[streaming] object RunStore {

  final case class Run(name: String, id: Long, weight: Long)

  /** One size-tiered compaction step over `dir` (see class doc). */
  def maybeCompact(spark: SparkSession, dir: String, schema: StructType,
      partCol: Option[String], batchId: Long, minMerge: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val runs = listRuns(fs, root, batchId)
    def tier(w: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(w.max(1))) / 2 // log4
    val group = runs.groupBy(r => tier(r.weight)).toSeq
      .filter(_._2.size >= minMerge).sortBy(_._1)
      .headOption.map(_._2).getOrElse(return)
    val target = new org.apache.hadoop.fs.Path(root,
      s"c${group.map(_.id).max}_${group.map(_.weight).sum}_$batchId")
    val tmp = new org.apache.hadoop.fs.Path(root, "compact_tmp")
    val merged = group.map(r => spark.read.schema(schema).parquet(s"$dir/${r.name}"))
      .reduce(_.unionByName(_))
      .write.mode("overwrite")
    partCol.fold(merged)(c => merged.partitionBy(c)).parquet(tmp.toString)
    // same-name remnant of a crashed retry of this very merge: identical
    // content by construction (same group, same batch), safe to replace
    fs.delete(target, true)
    fs.rename(tmp, target)
    // commit point passed — now (and only now) drop the sources
    group.foreach(r => fs.delete(new org.apache.hadoop.fs.Path(root, r.name), true))
  }

  /** Runs readable at `batchId`: per-batch `b<id>` dirs and compacted
    * `c<id>_<n>_<g>` dirs with id < batchId (bare legacy `c<id>` dirs
    * parse with weight id+1 — they merged everything up to id). A
    * half-written dir of the current batch or a `compact_tmp` remnant is
    * never listed.
    */
  def listRuns(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, batchId: Long): Seq[Run] =
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap {
        case n if n.startsWith("b") =>
          n.drop(1).toLongOption.map(id => Run(n, id, 1L))
        case n if n.startsWith("c") =>
          n.drop(1).split("_") match {
            case Array(id, w, _) =>
              for (i <- id.toLongOption; ww <- w.toLongOption) yield Run(n, i, ww)
            case Array(id) => id.toLongOption.map(i => Run(n, i, i + 1))
            case _ => None
          }
        case _ => None
      }
      .filter(_.id < batchId)
      .sortBy(_.id)

  /** All committed state from batches BEFORE `batchId`. Hadoop FS, not
    * java.io.File — the state dir may live on any distributed store.
    * Per-root reads unioned: hash-partition discovery is per-root, and
    * Spark refuses to infer partitions across sibling roots in one call;
    * run count is bounded by minMerge * tier count.
    */
  def readPrev(spark: SparkSession, dir: String, schema: StructType,
      batchId: Long): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Seq.empty
      else listRuns(fs, root, batchId)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      dirs.map(r => spark.read.schema(schema).parquet(s"$dir/${r.name}"))
        .reduce(_.unionByName(_))
  }
}
