package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BucketSig]] — the observe-fused per-bucket commit signature. The
  * load-bearing contract: its `sig` is BIT-IDENTICAL to the store's
  * historical read-back fold
  * `pmod(sum(cast(xxhash64(cols) as decimal(38,0))), Long.MaxValue)`,
  * and it works as an OBSERVED metric on a parquet write action (the
  * optimization replaces the read-back job with exactly that).
  */
class BucketSigSpec extends AnyFunSuite with SparkSpec {

  private def legacySigs(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Map[Int, Long] =
    df.groupBy(col("pt"))
      .agg(pmod(sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)")),
        lit(Long.MaxValue).cast("decimal(38,0)")).cast("long").as("sig"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap

  private def observedSigs(row: org.apache.spark.sql.Row): Map[Int, (Long, Long)] =
    row.getMap[Int, org.apache.spark.sql.Row](0).map { case (k, v) =>
      k -> ((v.getLong(0), v.getLong(1)))
    }.toMap

  test("matches the legacy decimal fold bit-for-bit, including negative hashes") {
    import spark.implicits._
    val df = spark.range(0, 5000)
      .select((col("id") % 7).cast("int").as("pt"),
        concat(lit("k"), col("id")).as("k"), (col("id") * 37 % 101).as("v"))
    val cols = Seq("k", "v").sorted
    val legacy = legacySigs(df, cols)
    val obs = Observation("sig-test")
    val counted = df.observe(obs, BucketSig(col("pt"), xxhash64(cols.map(col): _*)).as("sigs"))
    assert(counted.count() == 5000)
    val got = observedSigs(org.apache.spark.sql.Row(obs.get("sigs")))
    assert(got.view.mapValues(_._1).toMap == legacy)
    assert(got.values.map(_._2).sum == 5000L)
    assert(got.keySet == (0 until 7).toSet)
    // negative raw sums exercise the pmod leg: xxhash64 is signed
    assert(legacy.values.forall(_ >= 0L))
  }

  test("fires during a parquet write action (the staging-fusion contract)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketsig").toString
    val df = Seq((0, "a", 1L), (0, "b", 2L), (1, "c", 3L)).toDF("pt", "k", "v")
    val obs = Observation("sig-write")
    df.observe(obs, BucketSig(col("pt"), xxhash64(col("k"), col("v"))).as("sigs"))
      .write.mode("overwrite").partitionBy("pt").parquet(dir)
    val got = observedSigs(org.apache.spark.sql.Row(obs.get("sigs")))
    assert(got.keySet == Set(0, 1))
    assert(got(0)._2 == 2L && got(1)._2 == 1L)
    val legacy = legacySigs(spark.read.schema(df.schema).parquet(dir), Seq("k", "v"))
    assert(got.view.mapValues(_._1).toMap == legacy)
  }

  test("modular arithmetic helpers: pmod residue and wraparound-safe add") {
    val M = Long.MaxValue
    assert(BucketSig.pmodM(Long.MinValue) == M - 1)
    assert(BucketSig.pmodM(-1L) == M - 1)
    assert(BucketSig.pmodM(5L) == 5L)
    assert(BucketSig.addM(M - 1, M - 1) == M - 2) // wraps signed, still exact
    assert(BucketSig.addM(0L, M - 1) == M - 1)
    assert(BucketSig.addM(1L, M - 1) == 0L)
  }
}
