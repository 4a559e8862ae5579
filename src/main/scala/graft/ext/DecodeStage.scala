package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit parallelism for the codec/media DECODE stages — the
  * `groupBy(file_group).agg(collect_list(...)) -> mapPartitions(decode)`
  * shape every hand-rolled reader (parquet/ORC/avro/zip/tar/gzip/npy/
  * safetensors/delta/iceberg/roaring/html, and the media families over
  * per-user event streams) shares.
  *
  * These stages carry a few hundred KB of grouped rows but seconds of
  * per-group CPU (encode + decode of a whole file group), so AQE's
  * byte-based post-shuffle coalescing — target = max(bytes/parallelism,
  * minPartitionSize) — collapses them to one or two tasks and the decode
  * runs serially (r13 measured q_orc_read's decode as ONE 1.33 s task).
  * r13 compensated with a session-wide 64k coalesce floor, but that
  * floor leaks into every OTHER small shuffle stage: at 32 cores the
  * shuffle-bound queries paid 1.2-3x in tiny-task scheduling for no
  * bytes (q_bloom_semijoin 1.93 s vs 0.65 s under the default floor,
  * QueryTime A/B, this round). The structural fix is to size the decode
  * exchange EXPLICITLY: a user-numbered `repartition(n, key)` is never
  * coalesced by AQE, and the downstream groupBy on the same key reuses
  * the exchange (guide §2.4), so the decode stage keeps cluster-wide
  * parallelism while every byte-proportional stage stays under AQE's
  * default sizing. `defaultParallelism` (total cores) is scale-adaptive
  * by construction — never a constant tuned to one deployment.
  */
object DecodeStage {

  /** `df.transform(DecodeStage.spread(key))` immediately before a
    * `groupBy(key...)` whose aggregation feeds a per-group decode.
    */
  def spread(key: Column)(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)

  /** Streaming replacement for the readers'
    * `groupBy(group).agg(sort_array(collect_list(...)))` decode feed
    * (guide §5, r14): that aggregation buffers EVERY group of a partition
    * in the ObjectHashAggregate at once — bounded at test scale, but at
    * 100 TB the agg holds whole file groups' blobs on-heap per key.
    * Callers instead [[spread]] on the group key, sortWithinPartitions on
    * the sort column, and stream groups one at a time off the sorted run
    * (which spills gracefully): rows of one group are consecutive
    * whenever the group key is a function of the sort column that is
    * monotone in it (`doc_id div N` over unique doc_ids — the readers'
    * shape), and arrive already in `sort_array` order. Only ONE group's
    * rows are materialized at any moment.
    */
  def groupConsecutive[R](it: Iterator[R], groupOf: R => Long): Iterator[(Long, Seq[R])] = {
    val buf = it.buffered
    new Iterator[(Long, Seq[R])] {
      def hasNext: Boolean = buf.hasNext
      def next(): (Long, Seq[R]) = {
        val g = groupOf(buf.head)
        val rows = scala.collection.mutable.ArrayBuffer.empty[R]
        while (buf.hasNext && groupOf(buf.head) == g) rows += buf.next()
        (g, rows.toSeq)
      }
    }
  }
}
