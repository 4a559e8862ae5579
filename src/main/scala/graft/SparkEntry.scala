package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full query catalog: Spark impl + optional DuckDB oracle per query. */
  def catalog: Map[String, QueryDef] =
    CoreQueries.all ++ graft.ext.ExtQueries.all ++
      graft.queries.AnalyticsQueries.all ++ graft.queries.CurationQueries.all ++
      graft.ext.ReleaseQueries.all ++ graft.queries.OpsQueries.all ++
      graft.ext.RetrievalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q_orders_report.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
