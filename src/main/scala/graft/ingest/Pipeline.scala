package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.decode.Decode
import graft.graph.GraphOps
import graft.graph.GraphOps.State
import graft.normalize.Normalize
import graft.schema.Schemas
import graft.state.Upserts
import graft.temporal.Temporal

/** The full ingestion pipeline: envelope log → temporal-property-graph
  * snapshot tables, set-at-a-time.
  *
  * Replaces the reference's per-message fan-out of 3-10 HTTP round-trips
  * (cmd/graph-vulcan-assets/main.go:19-20, §3.1) with per-micro-batch
  * joins + merges: the whole batch becomes ~4 MERGEs regardless of size.
  *
  * Sequencing: the reference relies on Kafka per-partition order. A batch
  * is split into per-key "epochs" (row_number over offset per key) and
  * epochs are applied in order — within an epoch each key appears at most
  * once, so set-at-a-time application is order-faithful
  * (tombstone → re-create sequences replay correctly; SURVEY.md §7.4).
  */
object Pipeline {

  final case class Config(
      awsAccountAnnotationKey: String = "discovery/aws/account",
      strict: Boolean = true)

  /** Empty snapshot state with the canonical schemas. */
  def emptyState(spark: SparkSession): State = State(
    assets = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.assetSchema),
    teams = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.teamSchema),
    owns = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.ownsSchema),
    parentOf = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.parentOfSchema))

  /** Refresh path (reference: main.go:116-141) for a deduplicated batch of
    * non-tombstone decoded events. One upsert per snapshot table.
    */
  def refresh(st: State, batch: DataFrame, now: Column, cfg: Config): State = {
    val b = batch.select(
      col("payload.AssetType").as("type"),
      col("payload.Identifier").as("identifier"),
      col("payload.Team.Id").as("team_identifier"),
      col("payload.Team.Name").as("team_name"),
      col("payload.Annotations").as("annotations"),
      col("offset"))

    // AWS-account parents derived from matching annotations
    // (reference: main.go:131-138, 223-243)
    val aws = Normalize.matchingAnnotations(b, "annotations", cfg.awsAccountAnnotationKey)
      .withColumn("aws_arn", Normalize.normalizeAwsAccountId(col("annotation_value")))
      .filter(col("aws_arn").isNotNull)
      .select(col("type"), col("identifier"), col("aws_arn"))

    val assetUpdates = b.select(col("type"), col("identifier"))
      .unionByName(aws.select(lit("AWSAccount").as("type"), col("aws_arn").as("identifier")))
      .distinct()
      .withColumn("ts", now)
      .withColumn("expiration", lit(Schemas.Unexpired))

    // several keys may carry the same team in one epoch — last writer
    // (by offset) provides the name, like sequential processing would
    val teamUpdates = b.groupBy(col("team_identifier").as("identifier"))
      .agg(max_by(col("team_name"), col("offset")).as("name"))

    val ownsUpdates = b.select(
        col("team_identifier").as("team_id"),
        Upserts.assetId(col("type"), col("identifier")).as("asset_id"))
      .distinct()
      .withColumn("start_time", now)
      .withColumn("end_time", lit(null).cast("timestamp"))

    val parentUpdates = aws.select(
        concat(lit("AWSAccount/"), col("aws_arn")).as("parent_id"),
        Upserts.assetId(col("type"), col("identifier")).as("child_id"))
      .distinct()
      .withColumn("ts", now)
      .withColumn("expiration", lit(Schemas.Unexpired))

    State(
      assets = Upserts.upsertAssets(st.assets, assetUpdates),
      teams = Upserts.upsertTeams(st.teams, teamUpdates),
      owns = Upserts.upsertOwns(st.owns, ownsUpdates),
      parentOf = Upserts.upsertParentOf(st.parentOf, parentUpdates))
  }

  /** Expire path (reference: main.go:270-364) for a batch of tombstones. */
  def expire(st: State, tombstones: DataFrame, now: Column): State = {
    val tb = tombstones.select(
      col("asset_type"),
      col("identifier").as("asset_identifier"),
      col("team_id").as("team_identifier"))
    GraphOps.expireCascade(st, tb, now)
  }

  /** Apply one epoch (each key at most once): refreshes first, then the
    * expire cascade over the post-refresh state.
    */
  def applyEpoch(st: State, epoch: DataFrame, now: Column, cfg: Config): State = {
    val refreshed = refresh(st, epoch.filter(!col("is_nil")), now, cfg)
    expire(refreshed, epoch.filter(col("is_nil")), now)
  }

  /** Batch replay: decode an envelope log (with an `offset` column giving
    * total input order) and fold it into snapshot state.
    *
    * @param baseEpochSecs processing-time stamp of epoch 1; each later
    *        epoch advances by one second (the set-at-a-time analog of the
    *        reference's per-event `time.Now()`).
    */
  def replay(
      spark: SparkSession,
      envelopes: DataFrame,
      cfg: Config = Config(),
      baseEpochSecs: Long = 1704067200L /* 2024-01-01T00:00:00Z */): State = {
    val decoded = Decode.decode(envelopes)
    if (cfg.strict) {
      val bad = decoded.filter(!col("valid")).count()
      require(bad == 0, s"strict mode: $bad undecodable/unsupported messages")
    }
    val events = Temporal.withPerKeySeq(decoded.filter(col("valid")), Seq("key"), "offset")
      .persist()
    try {
      val maxEpoch = events.agg(max(col("__epoch"))).collect()(0)
        .getAs[Any](0) match { case null => 0; case n: Int => n }
      var st = emptyState(spark)
      var e = 1
      while (e <= maxEpoch) {
        val now = to_timestamp(lit(baseEpochSecs + e - 1))
        st = applyEpoch(st, events.filter(col("__epoch") === e), now, cfg)
        // truncate lineage: each epoch's state feeds the next
        st = State(
          st.assets.localCheckpoint(true),
          st.teams.localCheckpoint(true),
          st.owns.localCheckpoint(true),
          st.parentOf.localCheckpoint(true))
        e += 1
      }
      st
    } finally events.unpersist()
  }
}
