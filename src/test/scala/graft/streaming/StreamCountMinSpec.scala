package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The streaming count-min grid converges to the batch grid exactly (same
  * md5 bucket derivation), state stays d*w cells whatever the key
  * cardinality, and estimates dominate exact counts (one-sided error).
  */
class StreamCountMinSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("streamed grid over 3 batches == batch grid; estimates >= exact") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val keys = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string")).as[String].collect().toSeq
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val src = MemoryStream[String]
    val q = StreamAnalytics.countMinStream(src.toDF().toDF("key"))
      .writeStream.format("memory").queryName("cmgrid")
      .outputMode(OutputMode.Complete()).start()
    try {
      keys.grouped(math.max(keys.size / 3, 1)).foreach(src.addData(_))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cmgrid").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    // grid state is bounded by d*w whatever the stream:
    streamed.size should be <= 4 * 256
    // identical to the batch grid built in one pass:
    val batch = StreamAnalytics.countMinStream(keys.toDF("key")).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    streamed shouldBe batch
    // one-sided error: estimate never undercounts; total overestimate bounded
    val errs = exact.map { case (k, n) =>
      val est = StreamAnalytics.countMinEstimate(streamed, k)
      est should be >= n
      est - n
    }
    (errs.sum.toDouble / errs.size) should be <= (math.E / 256) * keys.size
  }
}
