package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in graft.queries.*; each pack contributes a
  * `queries` map (name → builder) and an `oracles` map (name → DuckDB SQL
  * the driver runs on the same parquet tables for the correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + decimal-exact aggregation. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    queries("q_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueriesCore.queries ++
    graft.queries.QueriesEngine.queries ++
    graft.queries.QueriesData.queries ++
    graft.queries.QueriesFormats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.QueriesCore.oracles ++
    graft.queries.QueriesEngine.oracles ++
    graft.queries.QueriesData.oracles ++
    graft.queries.QueriesFormats.oracles
}
