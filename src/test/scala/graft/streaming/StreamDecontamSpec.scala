package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The streaming decontamination gate is stateless and batch-equal: the
  * union of per-batch verdicts equals the batch run over the union of the
  * batches, and redelivery re-emits identical rows (no state to corrupt).
  */
class StreamDecontamSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("per-batch verdicts == batch run; redelivery is verdict-identical") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    // benchmark set: shingle hashes of the % 97 suite (the q_contamination
    // suiteA construction)
    val benchHashes = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 0)
      .select(explode(array_distinct(transform(
        graft.ext.TextAnalysis.shingles(
          graft.ext.TextAnalysis.tokens(col("text")), 3),
        x => graft.functions.Md5PrefixLong(x, 15)))).as("h"))
      .distinct().as[Long].collect().toSeq
    benchHashes should not be empty

    val src = MemoryStream[(Long, String)]
    val q = StreamAnalytics.decontaminationGate(
        src.toDF().toDF("doc_id", "text"), benchHashes)
      .writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(200).foreach(src.addData(_))
      // redeliver the first 100 docs — stateless gate re-emits, same rows
      src.addData(docs.take(100))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("decontam").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = StreamAnalytics.decontaminationGate(
        graft.Tables.documents(spark, sf), benchHashes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    batch should not be empty
    // distinct streamed verdicts == batch verdicts (the suite's own docs
    // hit themselves here — the BATCH query's exclusion rule lives in the
    // declared q_contamination_matrix, the gate flags everything)
    streamed.toSet shouldBe batch
    // redelivered docs produced duplicate identical rows, nothing else
    val dupCounts = streamed.groupBy(identity).view.mapValues(_.size)
    dupCounts.values.toSet should (be(Set(1)) or be(Set(1, 2)))
    dupCounts.filter(_._2 == 2).keys.foreach { case (id, _) =>
      assert(docs.take(100).exists(_._1 == id))
    }
  }
}
