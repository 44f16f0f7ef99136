package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, CoreQueries, DataOpsQueries, ExtraQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over /root/testdata/sf* plus (where SQL-expressible) a DuckDB
  * oracle. Query modules register themselves in `all`.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    CoreQueries.defs ++ DataOpsQueries.defs ++ ExtraQueries.defs ++
      AdvancedQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q32 runs the reference's whole analytic core — PIT
    * identity, as-of alignment, factor cumprods, anchor-to-last, split
    * and TR application — through graft.adjust in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q32_adjusted_close")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
