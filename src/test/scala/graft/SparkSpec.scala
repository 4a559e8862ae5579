package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local SparkSession for all suites (one JVM, one session). */
trait SparkSpec { this: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GRAFT_CPUS: A/B tooling hook (QueryTime/JobProfile at the bench's
    // core count, e.g. 32) — suites keep the 4-core default
    val s = GraftSession.local(cpus = sys.env.get("GRAFT_CPUS").map(_.toInt).getOrElse(4))
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
