package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Incremental image near-duplicate detection over a PERCEPTUAL-HASH
  * STREAM: the streaming face of [[graft.ext.ImageDedup]] — the H3b
  * ([[StreamDedup]]) / H8d ([[StreamVecDedup]]) maintenance pattern
  * applied unchanged to the 56-bit dHash band index.
  *
  * The stream carries (user_id, dhash) rows — the hash is computed
  * upstream by the real codec pass (PNG decode → nearest-neighbor 8×8 →
  * difference hash, ImageDedup.hashesReal's mapPartitions), per-row work
  * that rides the ingest executor; THIS operator owns the cross-corpus
  * state. Per micro-batch, each new hash explodes into 8×7-bit bands,
  * the band rows are joined against the accumulated band index
  * (new-vs-old) and against the batch itself (new-vs-new), and
  * candidates are verified by Hamming distance ≤ threshold — the
  * signature IS 64 bits, so it rides the band rows and no separate
  * signature store is needed. Work per batch is O(batch × bands) plus a
  * partition-pruned index join — never a rescan of the accumulated
  * corpus.
  *
  * State layout (parquet, one subdir per batch — a redelivered batch
  * OVERWRITES its own subdir, so at-least-once delivery cannot duplicate
  * index rows); band dirs are hash-partitioned by a bucket of (band, bv)
  * so a micro-batch reads only the partitions its own keys hash into;
  * both families tier-compact under [[RunStore]]'s size-tiered policy so
  * read fan-in stays O(log) in stream age:
  *
  *   statePath/bands/b<batchId>/pb=<hash(band,bv)%PB>/ (user_id, dhash, band, bv)
  *   pairsPath/b<batchId>/                             (user_a, user_b, hamming, batch)
  */
object StreamImageDedup {

  private val Bands = 8
  private val BandBits = 7
  val MaxHamming = 14
  private val PB = 16

  private def pbOf(band: org.apache.spark.sql.Column,
      bv: org.apache.spark.sql.Column) = pmod(hash(band, bv), lit(PB))

  private val bandSchema = new StructType()
    .add("user_id", LongType).add("dhash", LongType)
    .add("band", IntegerType).add("bv", LongType).add("pb", IntegerType)
  private val pairSchema = new StructType()
    .add("user_a", LongType).add("user_b", LongType)
    .add("hamming", LongType).add("batch", LongType)

  /** Start streaming image dedup over a stream of (user_id, dhash) rows. */
  def start(hashes: DataFrame, statePath: String, pairsPath: String,
      checkpointPath: String): StreamingQuery =
    hashes.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, pairsPath)
      }
      .start()

  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
      pairsPath: String, minMerge: Int = 8): Unit = {
    val spark = batch.sparkSession
    // bound per-batch dir accumulation (one dir per micro-batch otherwise)
    RunStore.maybeCompact(spark, s"$statePath/bands", bandSchema, Some("pb"),
      batchId, minMerge)
    RunStore.maybeCompact(spark, pairsPath, pairSchema, None, batchId, minMerge)

    // one hash per image: an at-least-once source redelivering a user_id
    // WITHIN the batch must not fan out duplicate band rows (the hash is
    // deterministic per image, so any row wins)
    val hashes = batch.select(col("user_id").cast("long"),
      col("dhash").cast("long")).dropDuplicates("user_id")
    val newBands = hashes.select(col("user_id"), col("dhash"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("dhash"), b * BandBits)
              .bitwiseAND(lit((1L << BandBits) - 1)).as("bv"))
        }: _*)).as("bnd"))
      .select(col("user_id"), col("dhash"),
        col("bnd.band").as("band"), col("bnd.bv").as("bv"))
      .withColumn("pb", pbOf(col("band"), col("bv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // partition pruning: the accumulated band index is corpus-scale; a
      // batch only matches rows whose (band, bv) hashes into the batch's
      // own buckets (≤ PB driver-side ints)
      val batchPbs = newBands.select("pb").distinct().collect().map(_.getInt(0)).toSeq
      val prevBands = RunStore.readPrev(spark, s"$statePath/bands", bandSchema, batchId)
        .filter(col("pb").isin(batchPbs: _*))
        // absorbs the duplicate-row crash window of maybeCompact AND a
        // user redelivered across earlier batches
        .dropDuplicates("user_id", "band")

      // new-vs-new + new-vs-old; pairs are emitted once, by the batch
      // that completes them. The user_id inequality guards the case of a
      // user redelivered in a LATER batch (would otherwise self-pair).
      val within = newBands.as("a").join(newBands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("user_a"),
          least(col("a.dhash"), col("b.dhash")).as("ha"),
          col("b.user_id").as("user_b"),
          greatest(col("a.dhash"), col("b.dhash")).as("hb"))
      val against = newBands.as("n").join(prevBands.as("p"),
          col("n.band") === col("p.band") && col("n.bv") === col("p.bv") &&
            col("n.user_id") =!= col("p.user_id"))
        .select(least(col("n.user_id"), col("p.user_id")).as("user_a"),
          least(col("n.dhash"), col("p.dhash")).as("ha"),
          greatest(col("n.user_id"), col("p.user_id")).as("user_b"),
          greatest(col("n.dhash"), col("p.dhash")).as("hb"))
      // hamming is symmetric, so carrying (min, max) hash per pair keeps
      // the distinct() exact even though ha/hb may swap sides
      val verified = within.unionByName(against).distinct()
        .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= MaxHamming)
        .select(col("user_a"), col("user_b"), col("hamming"))
        .orderBy(col("user_a"), col("user_b"))

      // per-batch overwrite => idempotent under redelivery
      verified.withColumn("batch", lit(batchId))
        .write.mode("overwrite").parquet(s"$pairsPath/b$batchId")
      newBands.write.mode("overwrite").partitionBy("pb")
        .parquet(s"$statePath/bands/b$batchId")
    } finally newBands.unpersist()
  }

  /** All near-dup pairs emitted so far, one row per (user_a, user_b):
    * the latest completing batch's row wins when an upstream redelivery
    * re-completes a pair in a later batch.
    */
  def allPairs(spark: SparkSession, pairsPath: String): DataFrame =
    RunStore.readPrev(spark, pairsPath, pairSchema, Long.MaxValue)
      .groupBy(col("user_a"), col("user_b"))
      .agg(max_by(col("hamming"), coalesce(col("batch"), lit(-1L))).as("hamming"))
}
