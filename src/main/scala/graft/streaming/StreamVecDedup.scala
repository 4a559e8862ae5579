package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructType}
import graft.ext.Similarity

/** Incremental embedding near-duplicate detection over a VECTOR STREAM —
  * the ingestion shape of a streaming vector store, and the
  * embedding-modality sibling of [[StreamDedup]] (reference scope ends at
  * graph ETL; a training-data pipeline dedups its embedding space at
  * ingestion, not with nightly corpus rescans).
  *
  * Per micro-batch, each new vector gets its sign-LSH bucket
  * ([[Similarity.bucketOf]]) ONCE and is compared — exact cosine, native
  * codegen dot product — against ONLY its bucket's accumulated vectors
  * (new-vs-old) and bucket-mates within the batch (new-vs-new); pairs
  * with cosine >= tau are emitted once, by the completing batch. Work
  * per batch is O(batch * bucket_size), never O(corpus).
  *
  * State layout mirrors StreamDedup (shared [[RunStore]]: per-batch
  * overwrite dirs = redelivery-idempotent, hash-partitioned for
  * per-batch partition pruning, size-tiered compaction):
  *
  *   statePath/vecs/b<batchId>/pv=<bucket%PV>/  (vec_id, v, nrm, bucket)
  *   pairsPath/b<batchId>/                      (vec_a, vec_b, cosine, batch)
  *
  * `planes` is a CONFIG here, not corpus-derived as in the batch queries:
  * a stream cannot count its final corpus upfront. Size it for the
  * expected steady state (`Similarity.planesFor(expectedCorpus)`);
  * re-bucketing under a new plane count is a full index rewrite, exactly
  * like changing `StateStore.Config.buckets`.
  */
object StreamVecDedup {

  /** Index partition buckets (pruning granularity), same sizing logic as
    * StreamDedup.PB.
    */
  private val PV = 16

  private def pvOf(bucket: Column) = pmod(bucket, lit(PV))

  private val vecSchema = new StructType()
    .add("vec_id", LongType).add("v", "array<float>")
    .add("nrm", "double").add("bucket", "int").add("pv", "int")
  private val pairSchema = new StructType()
    .add("vec_a", LongType).add("vec_b", LongType)
    .add("cosine", "double").add("batch", LongType)

  private def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Start streaming vector dedup over a stream of (vec_id, embedding)
    * rows.
    */
  def start(
      vecs: DataFrame,
      statePath: String,
      pairsPath: String,
      checkpointPath: String,
      planes: Int,
      tau: Double): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, pairsPath, planes, tau)
      }
      .start()

  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
      pairsPath: String, planes: Int, tau: Double, minMerge: Int = 8,
      multiProbe: Boolean = true): Unit = {
    val spark = batch.sparkSession
    RunStore.maybeCompact(spark, s"$statePath/vecs", vecSchema, Some("pv"), batchId, minMerge)
    RunStore.maybeCompact(spark, pairsPath, pairSchema, None, batchId, minMerge)

    val vecs = batch
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("bucket", Similarity.bucketOf(col("v"), planes))
      .withColumn("pv", pvOf(col("bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count() // eager barrier (see Dedup.lshJaccardPairs)
    try {
      // multi-probe (the streaming analog of the batch ANN's, Similarity
      // annSearch): each BATCH vector also probes its `planes` hamming-1
      // neighbor buckets, recovering near-dups that fall just across one
      // hyperplane. The explode lands on the batch side only (planes+1
      // rows per new vector) — the corpus-scale index is never exploded —
      // and hamming-1 is symmetric, so probing one side finds every
      // boundary pair. Probed rows are CANDIDATE keys only; the stored
      // index keeps the true bucket.
      val probed =
        if (!multiProbe) vecs
        else vecs.withColumn("bucket", explode(array(
          col("bucket") +: (0 until planes).map(j =>
            col("bucket").bitwiseXOR(lit(1 << j))): _*)))

      // partition pruning: the accumulated index is corpus-scale; the
      // batch can only match vectors in its (probed) buckets' partitions
      // (≤ PV driver-side ints)
      val batchPvs = probed.select(pvOf(col("bucket")).as("pv")).distinct()
        .collect().map(_.getInt(0)).toSeq
      // dropDuplicates absorbs the duplicate-row crash window of
      // compaction; current batch wins for a redelivered vec_id (anti
      // join) so a vector never pairs with its own earlier copy
      val prev = RunStore.readPrev(spark, s"$statePath/vecs", vecSchema, batchId)
        .filter(col("pv").isin(batchPvs: _*))
        .dropDuplicates("vec_id")
        .join(vecs.select("vec_id"), Seq("vec_id"), "left_anti")

      def cosPairs(a: DataFrame, b: DataFrame, strictLess: Boolean): DataFrame = {
        val cond = col("a.bucket") === col("b.bucket") &&
          (if (strictLess) col("a.vec_id") < col("b.vec_id")
           else col("a.vec_id") =!= col("b.vec_id"))
        a.as("a").join(b.as("b"), cond)
          .withColumn("cosine",
            dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .filter(col("cosine") >= tau)
          .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
            greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
            col("cosine"))
      }
      // new-vs-new pairs each (probed) bucket-mate pair once (a < b);
      // new-vs-old normalizes to (min, max) so pair identity is
      // orientation-free; dropDuplicates collapses multi-probe repeats
      val emitted = cosPairs(probed, vecs, strictLess = true)
        .unionByName(cosPairs(probed, prev, strictLess = false))
        .dropDuplicates("vec_a", "vec_b")

      // per-batch overwrite => idempotent under redelivery; `batch` lets
      // allPairs keep one row per pair if a redelivery in a later batch
      // re-completes an already-emitted pair
      emitted.withColumn("batch", lit(batchId))
        .write.mode("overwrite").parquet(s"$pairsPath/b$batchId")
      vecs.write.mode("overwrite").partitionBy("pv")
        .parquet(s"$statePath/vecs/b$batchId")
    } finally vecs.unpersist()
  }

  /** All pairs emitted so far, one row per (vec_a, vec_b) — the latest
    * emitting batch wins on redelivery re-completion.
    */
  def allPairs(spark: SparkSession, pairsPath: String): DataFrame =
    RunStore.readPrev(spark, pairsPath, pairSchema, Long.MaxValue)
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(max_by(col("cosine"), coalesce(col("batch"), lit(-1L))).as("cosine"))
}
