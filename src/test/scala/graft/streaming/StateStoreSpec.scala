package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.graph.GraphOps.State
import graft.ingest.Pipeline
import graft.sources.Fixtures
import graft.state.ChangeSet
import java.nio.file.Files
import java.sql.Timestamp

/** The partition-limited versioned state sink: a micro-batch must rewrite
  * only the hash buckets its keys touch (O(batch) write amplification,
  * VERDICT r2 perf-weak #3), untouched buckets resolve through manifest
  * pointers, and chains compact once they span too many live versions.
  */
class StateStoreSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-02-01 00:00:00")

  /** State of `n` assets (ids a0..a<n-1>), empty other tables. */
  private def mkState(n: Int, bump: Set[String] = Set.empty): State = {
    val e = Pipeline.emptyState(spark)
    val assets = (0 until n).map { i =>
      val id = s"a$i"
      (id, "T", id, t0, if (bump(id)) t1 else t0, graft.schema.Schemas.Unexpired)
    }.toDF("id", "type", "identifier", "first_seen", "last_seen", "expiration")
    e.copy(assets = assets)
  }

  private def ptDirs(dir: String): Set[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("pt=")).toSet
  }

  private def assetRows(st: State): Set[(String, Timestamp)] =
    st.assets.collect().map(r =>
      (r.getAs[String]("id"), r.getAs[Timestamp]("last_seen"))).toSet

  test("a one-key change rewrites exactly one bucket; the rest resolve via pointers") {
    val root = Files.createTempDirectory("graft_store").toString
    val cfg = StateStore.Config(buckets = 16, maxChain = 8)

    StateStore.write(spark, root, 0L, mkState(64), changes = None, cfg)
    val v0Assets = ptDirs(s"$root/v0/assets")
    v0Assets.size should be > 10 // 64 keys over 16 buckets: all/most populated

    // bump one key, declare only that key changed
    val changes = ChangeSet.empty(spark).copy(assets = Seq("a5").toDF("id"))
    val m1 = StateStore.write(spark, root, 1L, mkState(64, bump = Set("a5")), Some(changes), cfg)

    val v1Assets = ptDirs(s"$root/v1/assets")
    v1Assets.size shouldBe 1 // O(batch), not O(state)
    new java.io.File(s"$root/v1/teams").exists() shouldBe false // untouched table: no dir at all

    // manifest: every v0 bucket still live, exactly one repointed to v1
    m1("assets").values.count(_ == 1L) shouldBe 1
    m1("assets").values.count(_ == 0L) shouldBe v0Assets.size - 1

    // read-back equals the full new state
    assetRows(StateStore.read(spark, root, 1L)) shouldBe assetRows(mkState(64, bump = Set("a5")))
    // and v0 still reads as the ORIGINAL state (time travel across the chain)
    assetRows(StateStore.read(spark, root, 0L)) shouldBe assetRows(mkState(64))
  }

  test("redelivered version write is idempotent") {
    val root = Files.createTempDirectory("graft_store").toString
    val cfg = StateStore.Config(buckets = 16)
    StateStore.write(spark, root, 0L, mkState(8), None, cfg)
    val ch = ChangeSet.empty(spark).copy(assets = Seq("a3").toDF("id"))
    val first = StateStore.write(spark, root, 1L, mkState(8, Set("a3")), Some(ch), cfg)
    val again = StateStore.write(spark, root, 1L, mkState(8, Set("a3")), Some(ch), cfg)
    again shouldBe first
    assetRows(StateStore.read(spark, root, 1L)) shouldBe assetRows(mkState(8, Set("a3")))
  }

  test("chains compact after maxChain live versions and pruning reclaims them") {
    val root = Files.createTempDirectory("graft_store").toString
    val cfg = StateStore.Config(buckets = 16, maxChain = 2)
    StateStore.write(spark, root, 0L, mkState(64), None, cfg)
    // each write bumps a different key → chain grows v0,v1,v2 → exceeds 2
    var bumped = Set.empty[String]
    for (v <- 1L to 3L) {
      bumped += s"a${v * 7}"
      val ch = ChangeSet.empty(spark).copy(assets = Seq(s"a${v * 7}").toDF("id"))
      StateStore.write(spark, root, v, mkState(64, bumped), Some(ch), cfg)
    }
    // v2's candidate manifest would span {v0,v1,v2} > maxChain=2 → v2 is a
    // full self-contained rewrite; v3 then chains onto v2 only
    StateStore.readManifest(spark, root, 2L).get
      .values.flatMap(_.values).toSet shouldBe Set(2L)
    StateStore.readManifest(spark, root, 3L).get
      .values.flatMap(_.values).toSet shouldBe Set(2L, 3L)
    // pruning after v3: v0/v1 are unreferenced and reclaimed; v2 survives
    // because v3's untouched buckets still point into it
    StateStore.prune(spark, root, keepFrom = 3L)
    StateStore.committedVersions(spark, root, Long.MaxValue) shouldBe Seq(2L, 3L)
    assetRows(StateStore.read(spark, root, 3L)) shouldBe assetRows(mkState(64, bumped))
  }

  test("a small micro-batch through applyBatch rewrites few buckets; state still matches replay") {
    val stateDir = Files.createTempDirectory("graft_state").toString
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    val rows = Fixtures.loadJson(spark, path)
    val (b1, b2) = (rows.filter($"offset" < 19), rows.filter($"offset" >= 19))
    val cfg = Pipeline.Config()
    StreamIngest.applyBatch(b1, 0L, stateDir, cfg, 1704067200L)
    StreamIngest.applyBatch(b2, 1L, stateDir, cfg, 1704067200L)

    val v0 = ptDirs(s"$stateDir/v0/assets")
    val v1 = ptDirs(s"$stateDir/v1/assets")
    v1.size should be < v0.size // the 2-event batch touches O(batch) buckets

    val streamed = StreamIngest.loadLatestState(spark, stateDir, Long.MaxValue).get
    val replayed = Pipeline.replay(spark, rows)
    // select columns by name: the store reads in canonical schema order,
    // the pipeline emits in construction order
    def shape(st: State) = (
      st.assets.select("id", "type", "identifier", "first_seen", "last_seen", "expiration")
        .orderBy("id").collect().toSeq,
      st.teams.select("id", "identifier", "name").orderBy("id").collect().toSeq,
      st.owns.select("id", "team_id", "asset_id", "start_time", "end_time")
        .orderBy("id").collect().toSeq,
      st.parentOf.select("id", "parent_id", "child_id", "first_seen", "last_seen", "expiration")
        .orderBy("id").collect().toSeq)
    shape(streamed) shouldBe shape(replayed)
  }
}
