package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The natural keys a fold touched in each snapshot table — the write-side
  * contract that lets the versioned state sink rewrite only the hash
  * partitions a micro-batch actually changed instead of the full snapshot
  * (O(batch) write amplification, not O(state)).
  *
  * Key columns: assets `(id)`, teams `(identifier)`, owns
  * `(team_id, asset_id)`, parent_of `(parent_id, child_id)`. Supersets are
  * safe (a touched-but-unchanged key only causes an extra partition
  * rewrite); misses are NOT (a changed row outside the declared partitions
  * would silently keep its old value on read).
  */
final case class ChangeSet(
    assets: DataFrame,
    teams: DataFrame,
    owns: DataFrame,
    parentOf: DataFrame) {

  def union(o: ChangeSet): ChangeSet = ChangeSet(
    assets.unionByName(o.assets),
    teams.unionByName(o.teams),
    owns.unionByName(o.owns),
    parentOf.unionByName(o.parentOf))

  /** Eagerly materialize + truncate lineage (the frames are batch-key
    * sized; callers checkpoint before releasing the caches the plans
    * reference).
    */
  def localCheckpoint(): ChangeSet = ChangeSet(
    assets.localCheckpoint(true),
    teams.localCheckpoint(true),
    owns.localCheckpoint(true),
    parentOf.localCheckpoint(true))
}

object ChangeSet {

  val assetKeySchema: StructType = StructType(Seq(StructField("id", StringType)))
  val teamKeySchema: StructType = StructType(Seq(StructField("identifier", StringType)))
  val ownsKeySchema: StructType = StructType(Seq(
    StructField("team_id", StringType), StructField("asset_id", StringType)))
  val parentOfKeySchema: StructType = StructType(Seq(
    StructField("parent_id", StringType), StructField("child_id", StringType)))

  def empty(spark: SparkSession): ChangeSet = {
    def e(s: StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    ChangeSet(e(assetKeySchema), e(teamKeySchema), e(ownsKeySchema), e(parentOfKeySchema))
  }
}
