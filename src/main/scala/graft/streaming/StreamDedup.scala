package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructType}
import graft.ext.Dedup

/** Incremental near-duplicate detection over a DOCUMENT STREAM: the
  * streaming face of [[graft.ext.Dedup]]'s MinHash+LSH pipeline.
  *
  * Per micro-batch, each new document is shingled and hashed ONCE, its
  * band keys are joined against the accumulated band index (new-vs-old)
  * and against the batch itself (new-vs-new), and only LSH candidates pay
  * an exact-Jaccard verification. Work per batch is O(batch * bands) plus
  * the index join — never a rescan of the corpus — which is what makes
  * dedup-at-ingestion viable when the accumulated corpus is 100 TB and
  * the batch is megabytes.
  *
  * State layout (parquet, one subdir per batch — a redelivered batch
  * OVERWRITES its own subdir, so at-least-once delivery cannot duplicate
  * index rows). Both index tables are hash-PARTITIONED by a bucket of
  * their lookup key, so a micro-batch reads only the partitions its own
  * keys hash into (partition pruning) instead of re-shuffling the whole
  * accumulated — corpus-scale — index per batch:
  *
  *   statePath/bands/b<batchId>/pb=<hash(bkey)%PB>/   (doc_id, band, bkey)
  *   statePath/docs/b<batchId>/pd=<hash(doc_id)%PB>/  (doc_id, hs)
  *   pairsPath/b<batchId>/                            (doc_a, doc_b, inter, uni, batch)
  *
  * All three families of per-batch dirs (bands, docs, pairs) tier-compact
  * under the same size-tiered policy ([[RunStore]] — shared with the
  * vector-stream sibling [[StreamVecDedup]]), so read fan-in stays
  * O(log) in stream age rather than one dir per micro-batch.
  */
object StreamDedup {

  private val Bands = 8
  private val R = 2

  /** Index partition buckets. At cluster scale this is sized so one
    * bucket of the accumulated index ≈ one task's worth of data; the
    * pruning ratio per small batch is (distinct batch buckets)/PB.
    */
  private val PB = 16

  private def pbOf(c: org.apache.spark.sql.Column) = pmod(hash(c), lit(PB))

  private val bandSchema = new StructType()
    .add("doc_id", LongType).add("band", "int").add("bkey", "string")
    .add("pb", "int")
  private val docSchema = new StructType()
    .add("doc_id", LongType).add("hs", "array<long>")
    .add("pd", "int")
  private val pairSchema = new StructType()
    .add("doc_a", LongType).add("doc_b", LongType)
    .add("inter", "int").add("uni", "int").add("batch", LongType)

  /** Start streaming dedup over a stream of (doc_id, text) rows. */
  def start(
      docs: DataFrame,
      statePath: String,
      pairsPath: String,
      checkpointPath: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, pairsPath)
      }
      .start()

  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
      pairsPath: String, minMerge: Int = 8): Unit = {
    val spark = batch.sparkSession
    // bound per-batch dir accumulation: a year-long stream would otherwise
    // leave one dir per micro-batch and every read would list them all
    RunStore.maybeCompact(spark, s"$statePath/bands", bandSchema, Some("pb"), batchId, minMerge)
    RunStore.maybeCompact(spark, s"$statePath/docs", docSchema, Some("pd"), batchId, minMerge)
    // pairs accumulate one dir per batch too; same tiering bounds the
    // allPairs read fan-in (no partition column — pairs are read whole)
    RunStore.maybeCompact(spark, pairsPath, pairSchema, None, batchId, minMerge)
    val docs = Dedup.wordShingleDocs(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // eager barrier (see Dedup.lshJaccardPairs)
    try {
      val newBands = Dedup.bandRowsOf(docs, Bands, R)
        .withColumn("pb", pbOf(col("bkey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // partition pruning: the accumulated band index is corpus-scale; a
      // batch only ever matches rows whose bkey hashes into the batch's
      // own buckets, so read just those partitions (≤ PB driver-side ints)
      val batchPbs = newBands.select("pb").distinct().collect().map(_.getInt(0)).toSeq
      val prevBands = RunStore.readPrev(spark, s"$statePath/bands", bandSchema, batchId)
        .filter(col("pb").isin(batchPbs: _*))

      // new-vs-new (within the batch) + new-vs-old (against the index);
      // pairs are emitted once, by the batch that completes them. The
      // doc_a <> doc_b guard matters when an upstream at-least-once
      // source redelivers a doc_id in a LATER batch: without it the
      // new-vs-old join pairs the doc with its own earlier copy (J=1).
      val within = newBands.as("a").join(newBands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val against = newBands.as("n").join(prevBands.as("p"),
          col("n.band") === col("p.band") && col("n.bkey") === col("p.bkey") &&
            col("n.doc_id") =!= col("p.doc_id"))
        .select(least(col("n.doc_id"), col("p.doc_id")).as("doc_a"),
          greatest(col("n.doc_id"), col("p.doc_id")).as("doc_b"))
      val candidates = within.unionByName(against).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // the doc-signature store is likewise pruned to the partitions the
      // candidates' doc ids live in before the verification join
      val candPds = candidates
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .select(pbOf(col("doc_id")).as("pd")).distinct()
        .collect().map(_.getInt(0)).toSeq
      // dropDuplicates: cheap on the pruned set, and absorbs the
      // duplicate-row crash window of maybeCompact
      val prevDocs = RunStore.readPrev(spark, s"$statePath/docs", docSchema, batchId)
        .filter(col("pd").isin(candPds: _*)).drop("pd")
        .dropDuplicates("doc_id")

      // current batch wins for a redelivered doc_id — never two hs rows
      // per doc, which would fan out duplicate verified pairs.
      // saltFactor: a batch doc that near-dups a large slice of the
      // accumulated corpus puts its doc_id in every one of those pairs —
      // spread its signature lookups instead of parking them on one reducer
      val docStore = prevDocs.join(docs, Seq("doc_id"), "left_anti").unionByName(docs)
      val verified = Dedup.verifyJaccard(candidates, docStore, saltFactor = 8)
        .orderBy(col("doc_a"), col("doc_b"))

      // per-batch overwrite => idempotent under redelivery; `batch` lets
      // allPairs keep one row per pair when an upstream redelivery makes a
      // later batch re-complete an already-emitted pair
      verified.withColumn("batch", lit(batchId))
        .write.mode("overwrite").parquet(s"$pairsPath/b$batchId")
      newBands.write.mode("overwrite").partitionBy("pb")
        .parquet(s"$statePath/bands/b$batchId")
      docs.withColumn("pd", pbOf(col("doc_id")))
        .write.mode("overwrite").partitionBy("pd")
        .parquet(s"$statePath/docs/b$batchId")
      newBands.unpersist(); candidates.unpersist()
    } finally docs.unpersist()
  }

  /** All pairs emitted so far, one row per (doc_a, doc_b). Batches
    * normally emit disjoint pairs, but an upstream at-least-once
    * redelivery of a doc in a LATER batch re-completes (re-emits) its
    * pairs — the latest batch's row wins here so downstream consumers
    * never see a pair twice.
    */
  def allPairs(spark: SparkSession, pairsPath: String): DataFrame =
    RunStore.readPrev(spark, pairsPath, pairSchema, Long.MaxValue)
      .groupBy(col("doc_a"), col("doc_b"))
      // coalesce: pairs dirs written before the `batch` column existed read
      // it as null — an all-null ordering would make max_by return null
      // inter/uni for those pairs instead of their stored counts
      .agg(max_by(struct(col("inter"), col("uni")),
        coalesce(col("batch"), lit(-1L))).as("s"))
      .select(col("doc_a"), col("doc_b"),
        col("s.inter").as("inter"), col("s.uni").as("uni"))
}
