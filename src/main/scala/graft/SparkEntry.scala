package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"        -> (Relational.q1Agg _),
    "agg_global"    -> (Relational.qAggGlobal _),
    "filter_proj"   -> (Relational.qFilterProj _),
    "isin"          -> (Relational.qIsin _),
    "like"          -> (Relational.qLike _),
    "cast"          -> (Relational.qCast _),
    "topk"          -> (Relational.qTopK _),
    "limit"         -> (Relational.qLimit _),
    "distinct"      -> (Relational.qDistinct _),
    "value_counts"  -> (Relational.qValueCounts _),
    "minmax_group"  -> (Relational.qMinMaxGroup _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"        -> Relational.q1AggSql,
    "agg_global"    -> Relational.qAggGlobalSql,
    "filter_proj"   -> Relational.qFilterProjSql,
    "isin"          -> Relational.qIsinSql,
    "like"          -> Relational.qLikeSql,
    "cast"          -> Relational.qCastSql,
    "topk"          -> Relational.qTopKSql,
    "limit"         -> Relational.qLimitSql,
    "distinct"      -> Relational.qDistinctSql,
    "value_counts"  -> Relational.qValueCountsSql,
    "minmax_group"  -> Relational.qMinMaxGroupSql,
  )
}
