package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.graph.GraphOps.State
import graft.ingest.Pipeline
import graft.schema.Schemas

/** A1/E1 — Structured Streaming ingestion: envelope stream → snapshot
  * tables (reference: stream/kafka/kafka.go:64-106 at-least-once consumer
  * loop + the per-message handler fan-out, collapsed to per-micro-batch
  * set-at-a-time folds).
  *
  * Delivery: Spark's checkpoint WAL gives at-least-once batch replay
  * (the analog of kafka.go:102-104 store-offset-after-handler). The state
  * sink is VERSIONED per batch — `statePath/v<batchId>/<table>` — and a
  * replayed batch deterministically rebuilds its version from the
  * previous one, so at-least-once + idempotent rebuild = effectively
  * exactly-once state (proven by kafka_test.go:136-211's analog in
  * StreamingSpec).
  */
object StreamIngest {

  /** Kafka envelope source (A1/A2). Not exercised in tests (no broker in
    * the build environment) — the mapping is the documented contract:
    * key/value arrive as binary (null value = tombstone), headers as
    * ARRAY<STRUCT<key STRING, value BINARY>>, and the partition offset is
    * the total order within a partition (reference relies on exactly this,
    * kafka.go:76).
    */
  def kafkaSource(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("includeHeaders", "true")
      .option("startingOffsets", "earliest")
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        transform(col("headers"), h => struct(
          h.getField("key").as("key"),
          h.getField("value").cast("string").as("value"))).as("metadata"),
        col("offset"))

  /** Start the ingestion query over any streaming envelope frame
    * (kafkaSource, or a MemoryStream in tests).
    */
  def start(
      envelopes: DataFrame,
      statePath: String,
      checkpointPath: String,
      cfg: Pipeline.Config = Pipeline.Config(),
      baseEpochSecs: Long = 1704067200L): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, cfg, baseEpochSecs)
      }
      .start()

  /** One micro-batch: previous committed state + batch → version
    * `v<batchId>`. Reprocessing the same batchId (at-least-once restart)
    * overwrites the same version with the same deterministic result.
    */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      statePath: String,
      cfg: Pipeline.Config,
      baseEpochSecs: Long): Unit = {
    val spark = batch.sparkSession
    val prev = loadLatestState(spark, statePath, maxVersion = batchId - 1)
      .getOrElse(Pipeline.emptyState(spark))
    val next = Pipeline.fold(spark, prev, batch, cfg, baseEpochSecs)
    writeState(next, s"$statePath/v$batchId")
  }

  def writeState(st: State, dir: String): Unit = {
    st.assets.write.mode("overwrite").parquet(s"$dir/assets")
    st.teams.write.mode("overwrite").parquet(s"$dir/teams")
    st.owns.write.mode("overwrite").parquet(s"$dir/owns")
    st.parentOf.write.mode("overwrite").parquet(s"$dir/parent_of")
  }

  /** Read one state version; explicit schemas tolerate empty tables. */
  def readState(spark: SparkSession, dir: String): State = State(
    assets = spark.read.schema(Schemas.assetSchema).parquet(s"$dir/assets"),
    teams = spark.read.schema(Schemas.teamSchema).parquet(s"$dir/teams"),
    owns = spark.read.schema(Schemas.ownsSchema).parquet(s"$dir/owns"),
    parentOf = spark.read.schema(Schemas.parentOfSchema).parquet(s"$dir/parent_of"))

  /** Latest committed version with id <= maxVersion (replay safety: a
    * half-written v<batchId> from a crashed attempt is never read when
    * rebuilding that same batch).
    */
  def loadLatestState(spark: SparkSession, statePath: String, maxVersion: Long): Option[State] = {
    val root = new java.io.File(statePath)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => f.getName.drop(1).toLongOption)
      .filter(_ <= maxVersion)
    versions.sorted.lastOption.map(v => readState(spark, s"$statePath/v$v"))
  }
}
