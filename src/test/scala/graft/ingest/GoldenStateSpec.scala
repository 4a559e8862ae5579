package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.schema.Schemas
import graft.sources.Fixtures
import java.sql.Timestamp

/** E2E golden-state scenario (analog of reference cmd/graph-vulcan-assets/
  * main_test.go:394-437 + testdata/messages.json): a 21-message stream —
  * creates, multi-team ownership, AWS-annotation parents, tombstones with
  * surviving owners, a full cascade death, re-create after tombstone, and
  * unknown-asset/unknown-team tombstone no-ops — replayed through
  * Pipeline.replay and diffed order-insensitively against the expected
  * world state.
  */
class GoldenStateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Base = 1704067200L // 2024-01-01T00:00:00Z
  private def at(offset: Long) = new Timestamp((Base + offset) * 1000L)
  private val arn0 = "arn:aws:iam::000000000000:root"
  private val arn1 = "arn:aws:iam::111111111111:root"
  private val arn2 = "arn:aws:iam::222222222222:root"
  private def aws(a: String) = s"AWSAccount/$a"
  private def host(n: Int) = s"Hostname/web$n.example.org"

  private lazy val state = {
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    Pipeline.replay(spark, Fixtures.loadJson(spark, path), Pipeline.Config())
  }

  test("teams: tombstones never create teams; names from last writer") {
    val teams = state.teams.collect()
      .map(r => r.getAs[String]("identifier") -> r.getAs[String]("name")).toSet
    teams shouldBe Set(
      "alpha" -> "alpha name", "beta" -> "beta name",
      "gamma" -> "gamma name", "delta" -> "delta name") // no omega
  }

  test("assets: exactly the created set, with correct expirations") {
    val assets = state.assets.collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Timestamp]("expiration") != Schemas.Unexpired)).toMap
    assets shouldBe Map(
      host(0) -> false, // beta tombstoned it but alpha still owns it
      host(1) -> false,
      host(2) -> false,
      host(3) -> false, // both owners alive even though parent aws1 died
      host(4) -> true,  // sole owner tombstoned -> dead
      host(5) -> false, // re-created after its tombstone
      host(6) -> false,
      aws(arn0) -> false,
      aws(arn1) -> true, // tombstoned by both owning teams
      aws(arn2) -> false) // NOT dead: cascade does not recurse to parents
    // web999 never created by its tombstone
  }

  test("owns edges: per-team end_time state") {
    val owns = state.owns.collect()
      .map(r => (r.getAs[String]("team_id"), r.getAs[String]("asset_id")) ->
        Option(r.getAs[Timestamp]("end_time"))).toMap
    owns.keySet shouldBe Set(
      "alpha" -> host(0), "beta" -> host(0),
      "alpha" -> host(1), "alpha" -> host(2),
      "alpha" -> host(3), "beta" -> host(3),
      "beta" -> host(4),
      "alpha" -> aws(arn0), "alpha" -> aws(arn1), "beta" -> aws(arn1),
      "beta" -> aws(arn2),
      "gamma" -> host(5), "delta" -> host(6))
    // active edges
    owns("alpha" -> host(0)) shouldBe None
    owns("alpha" -> host(3)) shouldBe None
    owns("beta" -> host(3)) shouldBe None
    owns("gamma" -> host(5)) shouldBe None // re-activated by the re-create
    owns("beta" -> aws(arn2)) shouldBe None
    // ended edges carry their tombstone's processing time
    owns("beta" -> host(0)) shouldBe Some(at(11))
    owns("alpha" -> aws(arn1)) shouldBe Some(at(12))
    owns("beta" -> aws(arn1)) shouldBe Some(at(13))
    owns("beta" -> host(4)) shouldBe Some(at(14))
  }

  test("parent_of edges: AWS-annotation parents, cascade expires both directions") {
    val parents = state.parentOf.collect()
      .map(r => (r.getAs[String]("parent_id"), r.getAs[String]("child_id")) ->
        (r.getAs[Timestamp]("expiration") != Schemas.Unexpired)).toMap
    parents shouldBe Map(
      (aws(arn0), host(0)) -> false,
      (aws(arn0), host(1)) -> false, // long-form ARN annotation normalized
      (aws(arn0), host(2)) -> false,
      (aws(arn1), host(3)) -> true,  // expired when parent aws1 died
      (aws(arn2), host(4)) -> true)  // expired when child web4 died
  }

  test("death and edge-expiry timestamps follow sequential semantics") {
    val a = state.assets.collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Timestamp]("expiration")).toMap
    a(aws(arn1)) shouldBe at(13) // second tombstone killed it (first left beta active)
    a(host(4)) shouldBe at(14)
    val p = state.parentOf.collect()
      .map(r => (r.getAs[String]("parent_id"), r.getAs[String]("child_id")) ->
        r.getAs[Timestamp]("expiration")).toMap
    p((aws(arn1), host(3))) shouldBe at(13)
    p((aws(arn2), host(4))) shouldBe at(14)
  }

  test("re-create after tombstone preserves original first_seen and owns start_time") {
    val web5 = state.assets.filter(s"id = '${host(5)}'").collect()(0)
    web5.getAs[Timestamp]("first_seen") shouldBe at(15) // original create
    web5.getAs[Timestamp]("last_seen") shouldBe at(17)  // the re-create
    val edge = state.owns.filter(s"asset_id = '${host(5)}'").collect()(0)
    edge.getAs[Timestamp]("start_time") shouldBe at(15) // preserved across re-activation
  }

  test("at-least-once idempotence: replaying the same log twice-concatenated converges") {
    // the Spark analog of reference kafka_test.go:136-211 — reprocessing a
    // prefix must not change the final state (upserts are idempotent)
    val path = getClass.getResource("/fixtures/scenario.json").getPath
    val env = Fixtures.loadJson(spark, path)
    val n = env.count()
    val doubled = env.unionByName(
      env.withColumn("offset", org.apache.spark.sql.functions.col("offset") + n))
    val st2 = Pipeline.replay(spark, doubled, Pipeline.Config())
    // same vertices/edges and same liveness; times shift (second pass
    // re-stamps last_seen) but liveness/structure must be identical
    def shape(st: graft.graph.GraphOps.State) = (
      st.assets.collect().map(r => (r.getAs[String]("id"),
        r.getAs[Timestamp]("expiration") != Schemas.Unexpired)).toSet,
      st.owns.collect().map(r => (r.getAs[String]("team_id"),
        r.getAs[String]("asset_id"),
        r.getAs[Timestamp]("end_time") == null)).toSet,
      st.teams.collect().map(_.getAs[String]("identifier")).toSet)
    shape(st2) shouldBe shape(state)
  }
}
