package graft.tools

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-Spark-job wall-clock breakdown of one declared query
  * (Test/runMain graft.tools.JobProfile <sfdir> <query...>): every job the
  * query triggers, with its call site and duration — localizes which
  * action inside a multi-job lifecycle query owns the seconds (guide §1:
  * measure first; the SQL UI is off in this harness, so this is the
  * listener-level equivalent).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_ivf_incremental")
    val spark = SparkSpec.session
    spark.range(1000).selectExpr("sum(id)").collect()

    case class J(id: Int, site: String, var start: Long = 0L, var end: Long = 0L,
        var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs(e.jobId) = J(e.jobId, site, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        jobs.get(e.stageId).foreach(_.tasks += 1) // approx; task census unused
      }
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm: codegen/JIT/FS init, like the bench's untimed pass
      spark.sqlContext.clearCache()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener drain
      val js = jobs.synchronized(jobs.values.toSeq).sortBy(_.start)
      val jobSum = js.map(j => (j.end - j.start) / 1e3).sum
      println(f"[jobprofile] $name rows=$n total=$total%.2fs jobs=${js.size} jobSum=$jobSum%.2fs gap=${total - jobSum}%.2fs")
      var prevEnd = 0L
      js.foreach { j =>
        val pre = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
        println(f"[jobprofile]   job=${j.id}%3d pre-gap=$pre%5.2fs run=${(j.end - j.start) / 1e3}%5.2fs  ${j.site}")
        prevEnd = math.max(prevEnd, j.end)
      }
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
