package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The PQ drift monitor end-to-end over a MemoryStream: an in-distribution
  * window scores ~the training baseline (drift_ppm ~ 1e6), a shifted
  * window scores far above it — the retrain signal.
  */
class StreamPqDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("in-distribution windows sit near baseline; a shifted window spikes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val books = graft.ext.Pq.codebooks(spark, sf)
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    // train-time baseline: mean reconstruction error over the corpus
    val baseline = graft.Tables.embeddings(spark, sf)
      .select(graft.ext.Pq.reconstructionError(col("embedding"), books).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    baseline should be > 0.0

    val src = MemoryStream[(java.sql.Timestamp, Array[Float])]
    val q = StreamAnalytics.pqDriftMonitor(
        src.toDF().toDF("ts", "v"), books, baseline,
        windowLen = "10 minutes", watermark = "20 minutes")
      .writeStream.format("memory").queryName("pqdrift")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      // window 1: the training vectors themselves (in-distribution)
      src.addData(corpus.take(60).map(v => (ts(0), v)).toSeq)
      // window 2: every component shifted +0.5 — off the codebook geometry
      src.addData(corpus.take(60).map(v => (ts(11), v.map(_ + 0.5f))).toSeq)
      // window 3 + watermark push to close 1 and 2
      src.addData(Seq((ts(45), corpus.head)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("pqdrift").collect()
      .map(r => r.getAs[java.sql.Timestamp]("win_start").toString ->
        r.getAs[Long]("drift_ppm")).toMap
    val inDist = rows("2024-01-01 10:00:00.0")
    val shifted = rows("2024-01-01 10:10:00.0")
    // the training vectors' own window IS the baseline population sample
    inDist should be < 1500000L
    shifted should be > (2L * inDist)
  }
}
