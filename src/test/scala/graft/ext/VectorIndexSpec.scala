package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.{StateStore, TableStore}
import java.nio.file.Files

/** The persisted vector-index lifecycle ([[VectorIndex]], VERDICT r8
  * next #1): train-once persistence, frozen-centroid delta appends whose
  * merged assignment equals a full re-assignment (the q_ivf_incremental
  * invariant, re-proven here at spec scale), and the drift wire — the
  * E13 monitor's drift_ppm signal deciding append vs retrain, with the
  * retrain bumping the stored version.
  */
class VectorIndexSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val Dim = 64

  /** Deterministic synthetic embeddings: `n` vectors clustered around
    * `centers` unit-ish anchors, spread by a per-vector integer jitter.
    */
  private def vecs(ids: Range, centers: Int, shift: Double = 0.0): DataFrame = {
    val rows = ids.map { i =>
      val c = i % centers
      val v = (0 until Dim).map { d =>
        val base = if (d % centers == c) 10.0f else 1.0f
        (base + ((i * 31 + d * 7) % 5) * 0.1f + shift.toFloat * (d % 3)): Float
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x)))
  }

  private def tmp(): String = Files.createTempDirectory("graft-vecidx").toString

  private def asgMap(df: DataFrame): Map[Long, Long] =
    df.select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap

  test("append under frozen centroids: merged assignment == full re-assignment; centroids inherit") {
    val root = tmp()
    val base = vecs(0 until 80, 4)
    // a SMALL delta (4 keys over 8 buckets) so pointer inheritance is
    // actually observable — a corpus-wide delta would touch every bucket
    val delta = vecs(80 until 84, 4)
    VectorIndex.trainIvf(spark, root, base)
    val v1 = VectorIndex.appendIvf(spark, root, delta)
    v1 shouldBe 1L

    // invariant: stored-base ⊕ frozen-centroid delta == assigning the
    // FULL corpus under the same centroids
    val cents = VectorIndex.ivfCentroids(spark, root)
    val full = asgMap(Similarity.assignCells(base.unionByName(delta), cents))
    asgMap(VectorIndex.ivfAssignments(spark, root)) shouldBe full

    // the centroid table was NOT rewritten: its pointers still name v0
    val m = StateStore.readManifest(spark, s"$root/ivf", 1L).get
    m.pointers("ivf_centroids").values.toSet shouldBe Set(0L)
    // write I/O is bucket-granular: EXACTLY the delta keys' buckets were
    // rewritten at v1, every other bucket pointer still names v0
    val touched = delta
      .select(pmod(hash(col("vec_id")), lit(8)).as("pt"))
      .distinct().as[Int].collect().toSet
    touched.size should be < 8 // the inheritance claim must be non-vacuous
    m.pointers("ivf_assign").filter(_._2 == 1L).keySet shouldBe touched
    m.pointers("ivf_assign").filter(_._2 == 0L).keySet shouldBe
      m.pointers("ivf_assign").keySet.diff(touched)
  }

  test("drift wire: benign delta appends, drifted delta retrains with a version bump") {
    val root = tmp()
    val base = vecs(0 until 80, 4)
    val baseline = VectorIndex.trainIvf(spark, root, base)

    // benign arrivals: drawn from the SAME distribution — drift_ppm stays
    // near 1e6 (the monitor's "no drift" value) and the cheap path runs
    val benign = vecs(80 until 100, 4)
    val (v1, drift1, retrained1) =
      VectorIndex.maintain(spark, root, benign, base.unionByName(benign), baseline)
    retrained1 shouldBe false
    v1 shouldBe 1L
    drift1 should be < 2_000_000L
    StateStore.readManifest(spark, s"$root/ivf", v1).get
      .pointers("ivf_centroids").values.toSet shouldBe Set(0L)

    // drifted arrivals: a large systematic shift — quantization error
    // explodes relative to baseline, the monitor's threshold trips, and
    // maintain retrains on the full corpus and bumps the version
    val drifted = vecs(100 until 130, 4, shift = 40.0)
    val all = base.unionByName(benign).unionByName(drifted)
    val (v2, drift2, retrained2) =
      VectorIndex.maintain(spark, root, drifted, all, baseline)
    retrained2 shouldBe true
    v2 shouldBe 2L
    drift2 should be >= 2_000_000L
    // retrain rewrote the centroids AT the new version
    StateStore.readManifest(spark, s"$root/ivf", v2).get
      .pointers("ivf_centroids").values.toSet shouldBe Set(v2)
    // and the new assignment covers the whole corpus under the NEW quantizer
    val cents2 = VectorIndex.ivfCentroids(spark, root)
    asgMap(VectorIndex.ivfAssignments(spark, root)) shouldBe
      asgMap(Similarity.assignCells(all, cents2))
  }

  test("drift_ppm follows the E13 monitor contract (mean_err / baseline x 1e6)") {
    val root = tmp()
    val base = vecs(0 until 60, 3)
    val baseline = VectorIndex.trainIvf(spark, root, base)
    baseline should be > 0.0
    val delta = vecs(60 until 80, 3)
    val (_, driftPpm, _) =
      VectorIndex.maintain(spark, root, delta, base.unionByName(delta), baseline)
    val cents = TableStore.read(spark, s"$root/ivf", 0L, "ivf_centroids")
    val expected = (VectorIndex.quantErr(delta, cents) * 1e6 / baseline).toLong
    driftPpm shouldBe expected
  }

  test("PQ: persisted codebooks round-trip exactly; frozen-book delta codes == full codes") {
    val root = tmp()
    val base = vecs(0 until 60, 4)
    val delta = vecs(60 until 80, 4)
    VectorIndex.trainPq(spark, root, base)
    val books = VectorIndex.pqBooks(spark, root)
    // round-trip: the stored books reconstitute the trained shape (M
    // subspaces, codes ascending) and re-coding the base under them
    // reproduces the stored codes bit-for-bit
    books.foreach(b => b.map(_._1) shouldBe b.map(_._1).sorted)
    val storedCodes = VectorIndex.pqCodes(spark, root).collect().map(_.toSeq).toSet
    Pq.codesOf(base, books).collect().map(_.toSeq).toSet shouldBe storedCodes

    VectorIndex.appendPq(spark, root, delta) shouldBe 1L
    val merged = VectorIndex.pqCodes(spark, root).collect().map(_.toSeq).toSet
    Pq.codesOf(base.unionByName(delta), books)
      .collect().map(_.toSeq).toSet shouldBe merged
    // the codebook table inherited v0's pointers
    StateStore.readManifest(spark, s"$root/pq", 1L).get
      .pointers("pq_codebooks").values.toSet shouldBe Set(0L)
  }

  test("IVFADC: frozen-artifact delta codes == full recode; retraction erases code rows") {
    val root = tmp()
    val base = vecs(0 until 60, 4)
    val delta = vecs(60 until 80, 4)
    VectorIndex.trainIvf(spark, root, base)
    VectorIndex.trainIvfPq(spark, root, base)
    val books = VectorIndex.ivfPqBooks(spark, root)
    val cents = VectorIndex.ivfCentroids(spark, root)
    // round-trip: re-coding base residuals under the stored artifacts
    // reproduces the stored cell-carrying codes bit-for-bit
    val storedCodes = VectorIndex.ivfPqCodes(spark, root).collect().map(_.toSeq).toSet
    Pq.codesOf(VectorIndex.residualsOf(base, cents), books, carry = Seq("cell"))
      .collect().map(_.toSeq).toSet shouldBe storedCodes

    // the q_ivfpq_incremental invariant at spec scale: stored-base ⊕
    // frozen delta == full recode under the same quantizer + books
    VectorIndex.appendIvfPq(spark, root, delta) shouldBe 1L
    val merged = VectorIndex.ivfPqCodes(spark, root).collect().map(_.toSeq).toSet
    Pq.codesOf(VectorIndex.residualsOf(base.unionByName(delta), cents),
        books, carry = Seq("cell"))
      .collect().map(_.toSeq).toSet shouldBe merged
    // codebooks inherited v0's pointers (delta writes touch codes only)
    StateStore.readManifest(spark, s"$root/ivfpq", 1L).get
      .pointers("ivfpq_codebooks").values.toSet shouldBe Set(0L)

    // retraction: the erased vec_ids' code rows vanish, survivors intact
    VectorIndex.retractIvfPq(spark, root,
      Seq(3L, 61L).toDF("vec_id")) shouldBe 2L
    val after = VectorIndex.ivfPqCodes(spark, root)
    after.filter(col("vec_id").isin(3L, 61L)).count() shouldBe 0L
    after.collect().map(_.toSeq).toSet shouldBe
      merged.filterNot(r => Set(3L, 61L)(r.head.asInstanceOf[Long]))
  }

  test("quantErr is 0 for vectors that ARE centroids, positive otherwise") {
    val e = vecs(0 until 8, 2)
    val cents = e.select(col("vec_id").as("cell"),
      transform(col("v"), x => x.cast("double")).as("cv"), col("nrm").as("cn"))
    VectorIndex.quantErr(e, cents) shouldBe 0.0 +- 1e-6
    val other = vecs(100 until 108, 2, shift = 5.0)
    VectorIndex.quantErr(other, cents) should be > 0.0
  }
}
