package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

/** The persisted derived-text-frame lifecycle ([[CorpusIndex]] — the
  * VectorIndex pattern applied to the token and shingle frames):
  * full-build persistence, document-level delta upserts whose merged
  * frame equals a from-raw-text derivation (the q_token_incremental
  * invariant at spec scale, including the REPLACEMENT leg where a
  * redelivered document shrinks), and parquet round-trip exactness of
  * the stored rows.
  */
class CorpusIndexSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_corpusidx").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private val corpus = Seq(
    (1L, "web", "the quick brown fox jumps over the lazy dog"),
    (2L, "web", "a b c d e f g h i j k"),
    (3L, "books", "to be or not to be that is the question"),
    (10L, "web", "late arrival document with fresh tokens"),
    (11L, "books", "another late one"),
    (21L, "web", "x y z"))

  test("full build round-trips the token frame exactly") {
    val root = freshRoot()
    val docs = docsOf(corpus)
    CorpusIndex.buildTokens(spark, root, docs)
    sortedRows(CorpusIndex.storedTokens(spark, root)) shouldBe
      sortedRows(CorpusIndex.tokenRows(docs))
  }

  test("document-level token delta equals from-raw derivation, including a SHRUNKEN redelivery") {
    val root = freshRoot()
    val full = docsOf(corpus)
    // base: docs 10/11/21 absent; doc 1 delivered with a LONGER stale
    // text (so replacement must delete stale high-position rows, not
    // just overwrite matching keys)
    val base = docsOf(corpus.filterNot(r => Seq(10L, 11L, 21L).contains(r._1))
      .map { case (id, src, t) =>
        if (id == 1L) (id, src, t + " stale trailing tokens that must vanish entirely")
        else (id, src, t)
      })
    val delta = docsOf(corpus.filter(r => Seq(1L, 10L, 11L, 21L).contains(r._1)))
    CorpusIndex.buildTokens(spark, root, base)
    val v = CorpusIndex.appendTokenDocs(spark, root, delta)
    v shouldBe 1L
    sortedRows(CorpusIndex.storedTokens(spark, root)) shouldBe
      sortedRows(CorpusIndex.tokenRows(full))
  }

  test("document-level shingle delta equals from-raw derivation") {
    val root = freshRoot()
    val full = docsOf(corpus)
    val base = docsOf(corpus.filter(_._1 % 2 == 1))
    val delta = docsOf(corpus.filter(_._1 % 2 == 0))
    CorpusIndex.buildShingles(spark, root, base)
    CorpusIndex.appendShingleDocs(spark, root, delta) shouldBe 1L
    sortedRows(CorpusIndex.storedShingles(spark, root)) shouldBe
      sortedRows(CorpusIndex.shingleRows(full))
  }

  test("shingle retraction: a deleted document leaves no stored rows behind") {
    val root = freshRoot()
    val survivors = docsOf(corpus.filterNot(_._1 == 3L))
    CorpusIndex.buildShingles(spark, root, docsOf(corpus))
    // one maintenance commit: doc 21 redelivered, doc 3 erased
    CorpusIndex.appendShingleDocs(spark, root,
      docsOf(corpus.filter(_._1 == 21L)),
      deleteDocIds = Some(Seq(3L).toDF("doc_id"))) shouldBe 1L
    sortedRows(CorpusIndex.storedShingles(spark, root)) shouldBe
      sortedRows(CorpusIndex.shingleRows(survivors))
    // the erased doc is still present at v0 — retraction is versioned,
    // so a pinned reader of the pre-erasure snapshot stays consistent
    graft.streaming.TableStore
      .read(spark, CorpusIndex.shinglesPath(root), 0L, "shingles")
      .filter(col("doc_id") === 3L).count() should be > 0L
  }

  test("GDPR-style erasure: retract + prune leaves no byte of the erased doc on disk") {
    // retraction alone is versioned (pre-erasure snapshots stay
    // readable); a compliance erase must ALSO purge history. The flow is
    // retract → prune(keepFrom = the erasure version): the erased doc's
    // rows live only in its hash bucket, the erasure commit rewrote that
    // bucket, and prune reclaims every bucket dir no surviving manifest
    // references — so afterwards NO parquet file under the store root
    // holds the doc. Verified by brute force: read every remaining file.
    val root = freshRoot()
    CorpusIndex.buildTokens(spark, root, docsOf(corpus)) // v0
    CorpusIndex.appendTokenDocs(spark, root, // v1: unrelated maintenance
      docsOf(Seq((21L, "web", "x y z updated"))))
    val vErase = CorpusIndex.appendTokenDocs(spark, root, // v2: the erasure
      docsOf(Seq.empty), deleteDocIds = Some(Seq(3L).toDF("doc_id")))
    graft.streaming.StateStore.prune(
      spark, CorpusIndex.tokensPath(root), keepFrom = vErase)
    // the surviving frame is exactly the survivors' from-raw derivation
    val survivors = docsOf(corpus.filterNot(_._1 == 3L)
      .map { case (id, src, t) => if (id == 21L) (id, src, "x y z updated") else (id, src, t) })
    sortedRows(CorpusIndex.storedTokens(spark, root)) shouldBe
      sortedRows(CorpusIndex.tokenRows(survivors))
    // physical sweep: every parquet file still under the root, read raw
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    val raw = spark.read.parquet(
      files(new java.io.File(CorpusIndex.tokensPath(root))).map(_.getPath): _*)
    raw.filter(col("doc_id") === 3L).count() shouldBe 0L
    raw.filter(col("term") === "question").count() shouldBe 0L // doc 3's unique term
  }

  test("untouched buckets inherit their pointers across a delta") {
    val root = freshRoot()
    CorpusIndex.buildTokens(spark, root, docsOf(corpus))
    // a single-doc delta touches at most one bucket; every other bucket
    // pointer must still reference version 0's data dir
    CorpusIndex.appendTokenDocs(spark, root,
      docsOf(Seq((21L, "web", "x y z updated"))))
    val m = graft.streaming.StateStore
      .readManifest(spark, CorpusIndex.tokensPath(root), 1L).get
    val ptrs = m.pointers("tokens")
    ptrs.values.toSet should contain(0L)
    ptrs.values.count(_ == 1L) should be <= 1
  }
}
