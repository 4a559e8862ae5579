package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import java.nio.file.Files

/** The generic versioned table store ([[TableStore]]) — StateStore's
  * shadow-paging machinery opened to arbitrary table sets: full writes,
  * key-level incremental upserts with bucket-granular write I/O,
  * untouched-table pointer inheritance, idempotent redelivery, and the
  * additive-schema contract.
  */
class TableStoreSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val specs = Seq(
    TableStore.Spec("dim", Seq("k")),
    TableStore.Spec("facts", Seq("id")))
  private val cfg = StateStore.Config(buckets = 8)

  private def tmp(): String =
    Files.createTempDirectory("graft-tablestore").toString

  private def dim(rows: (String, Long)*) = rows.toDF("k", "v")
  private def facts(rows: (Long, String)*) = rows.toDF("id", "payload")

  test("full write + read round-trip for both tables") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L, "b" -> 2L),
        "facts" -> facts(1L -> "x", 2L -> "y", 3L -> "z")), cfg = cfg)
    TableStore.read(spark, root, 0L, "dim")
      .as[(String, Long)].collect().sorted shouldBe Seq("a" -> 1L, "b" -> 2L)
    TableStore.read(spark, root, 0L, "facts")
      .as[(Long, String)].collect().sorted shouldBe
      Seq(1L -> "x", 2L -> "y", 3L -> "z")
    TableStore.latestVersion(spark, root) shouldBe Some(0L)
  }

  test("incremental write: delta keys upsert, absent keys survive, untouched table inherits") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 20L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    // delta: replace id 3, add id 21; dim untouched (absent from frames)
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(3L -> "NEW", 21L -> "ADDED")), delta = true, cfg = cfg)

    val got = TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap
    got(3L) shouldBe "NEW"
    got(21L) shouldBe "ADDED"
    got(7L) shouldBe "p7" // an untouched key in a (probably) untouched bucket
    got should have size 21
    // the untouched table's pointers must all still name v0 (no rewrite)
    val m1 = StateStore.readManifest(spark, root, 1L).get
    m1.pointers("dim").values.toSet shouldBe Set(0L)
    // facts rewrote ONLY the buckets the two delta keys hash into
    val v1Buckets = m1.pointers("facts").filter(_._2 == 1L).keySet
    v1Buckets.size should be <= 2
    // and v0's remaining buckets still serve their rows
    (m1.pointers("facts").values.toSet - 1L) shouldBe Set(0L)
  }

  test("redelivered incremental write commits idempotently (same version, same delta)") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L), "facts" -> facts(1L -> "x", 2L -> "y")), cfg = cfg)
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(2L -> "y2")), delta = true, cfg = cfg)
    // redelivery: exact same write again must neither throw nor corrupt
    noException should be thrownBy TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(2L -> "y2")), delta = true, cfg = cfg)
    TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap shouldBe Map(1L -> "x", 2L -> "y2")
  }

  test("readForKeys opens only the keys' buckets") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 50L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    val keys = Seq(5L).toDF("id")
    val got = TableStore.readForKeys(spark, root, 0L, specs(1), keys)
      .as[(Long, String)].collect().toMap
    got(5L) shouldBe "p5"
    // a pruned read returns a subset, never the whole table
    got.size should be < 50
  }

  test("version history: older versions keep reading their own content") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L), "facts" -> facts(1L -> "x")), cfg = cfg)
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(1L -> "x2")), delta = true, cfg = cfg)
    TableStore.read(spark, root, 0L, "facts")
      .as[(Long, String)].collect().toMap shouldBe Map(1L -> "x")
    TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap shouldBe Map(1L -> "x2")
  }

  test("schema evolution: additive ok (inherited buckets null-fill), narrowing refused") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 20L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    // additive: new column `extra` rides the delta rows
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> Seq((21L, "n", 9L)).toDF("id", "payload", "extra")),
      delta = true, cfg = cfg)
    val got = TableStore.read(spark, root, 1L, "facts")
    got.schema.fieldNames should contain("extra")
    got.filter($"id" === 21L).select("extra").as[Long].head() shouldBe 9L
    got.filter($"id" === 7L).select("extra").as[Option[Long]].head() shouldBe None
    // narrowing (payload dropped) must be refused loudly
    val e = intercept[IllegalArgumentException] {
      TableStore.write(spark, root, 2L, specs,
        Map("facts" -> Seq((22L, 1L)).toDF("id", "extra")), delta = true, cfg = cfg)
    }
    e.getMessage should include("narrows")
  }

  test("deletes: a delete-only commit retracts the keys; untouched buckets inherit") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 20L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    TableStore.write(spark, root, 1L, specs, Map.empty, delta = true, cfg = cfg,
      deletes = Map("facts" -> Seq(3L, 11L).toDF("id")))
    val got = TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap
    got.keySet shouldBe (1L to 20L).toSet -- Set(3L, 11L)
    // only the two keys' buckets were rewritten; dim inherited untouched
    val m1 = StateStore.readManifest(spark, root, 1L).get
    m1.pointers("facts").filter(_._2 == 1L).keySet.size should be <= 2
    m1.pointers("dim").values.toSet shouldBe Set(0L)
    // and v0 still serves the pre-delete content (erasure is versioned)
    TableStore.read(spark, root, 0L, "facts").count() shouldBe 20L
  }

  test("deletes: a bucket every row left drops its pointer instead of pointing at emptiness") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L), "facts" -> facts(1L -> "x", 2L -> "y")), cfg = cfg)
    TableStore.write(spark, root, 1L, specs, Map.empty, delta = true, cfg = cfg,
      deletes = Map("facts" -> Seq(1L, 2L).toDF("id")))
    TableStore.read(spark, root, 1L, "facts").count() shouldBe 0L
    // zero pointers — the manifest may omit the table entry entirely
    StateStore.readManifest(spark, root, 1L).get
      .pointers.getOrElse("facts", Map.empty) shouldBe empty
  }

  test("deletes: a key in both the delta and the deletes survives with the delta's rows") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L), "facts" -> facts(1L -> "x", 2L -> "y")), cfg = cfg)
    // delete-then-reinsert: key 1 retracted AND redelivered in one commit
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(1L -> "REBORN")), delta = true, cfg = cfg,
      deletes = Map("facts" -> Seq(1L, 2L).toDF("id")))
    TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap shouldBe Map(1L -> "REBORN")
  }

  test("deletes: refused on a full write (nothing committed to retract from)") {
    val root = tmp()
    intercept[IllegalArgumentException] {
      TableStore.write(spark, root, 0L, specs,
        Map("dim" -> dim("a" -> 1L), "facts" -> facts(1L -> "x")), cfg = cfg,
        deletes = Map("facts" -> Seq(1L).toDF("id")))
    }.getMessage should include("deletes")
  }

  test("diff: the maintenance commit's audit trail, retraction included") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 10L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(3L -> "NEW", 11L -> "ADDED")), delta = true, cfg = cfg,
      deletes = Map("facts" -> Seq(7L).toDF("id")))
    val d = TableStore.diff(spark, root, "facts", 0L, 1L)
      .select($"change", $"id", $"payload").as[(String, Long, String)]
      .collect().toSet
    d shouldBe Set(
      ("added", 3L, "NEW"), ("added", 11L, "ADDED"),
      ("removed", 3L, "p3"), ("removed", 7L, "p7"))
    // untouched table diffs empty
    TableStore.diff(spark, root, "dim", 0L, 1L).count() shouldBe 0L
  }

  test("rebucket: content survives a modulus change and deltas resume at the new modulus") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 30L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    // an incremental write under a different modulus is refused loudly
    intercept[IllegalArgumentException] {
      TableStore.write(spark, root, 1L, specs,
        Map("facts" -> facts(1L -> "x")), delta = true,
        cfg = StateStore.Config(buckets = 32))
    }.getMessage should include("rebucket")
    // the documented growth path: one full rewrite at the new modulus
    val v1 = TableStore.rebucket(spark, root, specs, StateStore.Config(buckets = 32))
    v1 shouldBe 1L
    StateStore.readManifest(spark, root, 1L).get.buckets shouldBe 32
    TableStore.read(spark, root, 1L, "facts")
      .as[(Long, String)].collect().toMap shouldBe
      (1L to 30L).map(i => i -> s"p$i").toMap
    // deltas (upserts AND tombstones) now work at the new modulus
    TableStore.write(spark, root, 2L, specs,
      Map("facts" -> facts(31L -> "NEW")), delta = true,
      cfg = StateStore.Config(buckets = 32),
      deletes = Map("facts" -> Seq(7L).toDF("id")))
    val got = TableStore.read(spark, root, 2L, "facts")
      .as[(Long, String)].collect().toMap
    got.keySet shouldBe ((1L to 31L).toSet - 7L)
  }

  test("describe: per-(version, table) census from manifests alone") {
    val root = tmp()
    TableStore.write(spark, root, 0L, specs,
      Map("dim" -> dim("a" -> 1L),
        "facts" -> facts((1L to 20L).map(i => i -> s"p$i"): _*)), cfg = cfg)
    TableStore.write(spark, root, 1L, specs,
      Map("facts" -> facts(3L -> "NEW")), delta = true, cfg = cfg)
    val d = TableStore.describe(spark, root)
      .as[(Long, String, Int, Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    d((0L, "facts"))._3 shouldBe 8 // modulus
    d((0L, "facts"))._6 should be > 0L // live bytes resolved
    // v1 rewrote only the delta key's bucket; the rest inherit
    d((1L, "facts"))._5 shouldBe 1
    d((1L, "facts"))._4 shouldBe d((0L, "facts"))._4 // live bucket count unchanged
    d((1L, "dim"))._5 shouldBe 0 // untouched table wrote nothing here
  }

  test("full write requires every table; unknown table names are refused") {
    val root = tmp()
    intercept[IllegalArgumentException] {
      TableStore.write(spark, root, 0L, specs, Map("dim" -> dim("a" -> 1L)), cfg = cfg)
    }.getMessage should include("full write")
    intercept[IllegalArgumentException] {
      TableStore.write(spark, root, 0L, specs,
        Map("nope" -> dim("a" -> 1L)), cfg = cfg)
    }
  }
}
