package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Aggregates, Arrays, Dedup, Ingest, Joins, Multimodal, Relational, Scalars, SetOps, Similarity, Sql, TextAnalysis, Windows}
import graft.functions.Udfs

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
    "join_inner"     -> (Joins.qJoinInner _),
    "join_broadcast" -> (Joins.qJoinBroadcast _),
    "join_semi"      -> (Joins.qJoinSemi _),
    "join_anti"      -> (Joins.qJoinAnti _),
    "join_left"      -> (Joins.qJoinLeft _),
    "join_right"     -> (Joins.qJoinRight _),
    "join_full"      -> (Joins.qJoinFull _),
    "union_all"      -> (SetOps.qUnionAll _),
    "union_distinct" -> (SetOps.qUnionDistinct _),
    "intersect"      -> (SetOps.qIntersect _),
    "except"         -> (SetOps.qExcept _),
    "union_by_name"  -> (SetOps.qUnionByName _),
    "window_rank"    -> (Windows.qWindowRank _),
    "window_lag"     -> (Windows.qWindowLag _),
    "window_frame"   -> (Windows.qWindowFrame _),
    "window_ntile"   -> (Windows.qWindowNtile _),
    "string_funcs"   -> (Scalars.qStringFuncs _),
    "math_funcs"     -> (Scalars.qMathFuncs _),
    "date_funcs"     -> (Scalars.qDateFuncs _),
    "ts_arith"       -> (Scalars.qTsArith _),
    "hash_funcs"     -> (Scalars.qHashFuncs _),
    "agg_stats"      -> (Aggregates.qStats _),
    "percentile"     -> (Aggregates.qPercentile _),
    "distinct_agg"   -> (Aggregates.qDistinctAgg _),
    "rollup"         -> (Aggregates.qRollup _),
    "cube"           -> (Aggregates.qCube _),
    "grouping_sets"  -> (Aggregates.qGroupingSets _),
    "collect"        -> (Aggregates.qCollect _),
    "approx_distinct" -> (Aggregates.qApproxDistinct _),
    "sql_flagship"   -> (Sql.qSqlFlagship _),
    "sql_join"       -> (Sql.qSqlJoin _),
    "sql_subquery"   -> (Sql.qSqlSubquery _),
    "sql_case_when"  -> (Sql.qSqlCaseWhen _),
    "udf_scalar"     -> (Udfs.qUdfScalar _),
    "udaf_geomean"   -> (Udfs.qUdafGeoMean _),
    "array_funcs"    -> (Arrays.qArrayFuncs _),
    "array_explode"  -> (Arrays.qArrayExplode _),
    "array_contains" -> (Arrays.qArrayContains _),
    "text_stats"       -> (TextAnalysis.qTextStats _),
    "text_quality"     -> (TextAnalysis.qTextQuality _),
    "lang_id"          -> (TextAnalysis.qLangId _),
    "text_fingerprint" -> (TextAnalysis.qTextFingerprint _),
    "dedup_exact"   -> (Dedup.qDedupExact _),
    "dedup_minhash" -> (Dedup.qDedupMinhash _),
    "dedup_ngram"   -> (Dedup.qDedupNgram _),
    "dedup_simhash" -> (Dedup.qDedupSimhash _),
    "dedup_embed"   -> (Dedup.qDedupEmbed _),
    "knn_brute"     -> (Similarity.qKnnBrute _),
    "knn_ivf"       -> (Similarity.qKnnIvf _),
    "csv_scan"           -> (Ingest.qCsvScan _),
    "csv_infer"          -> (Ingest.qCsvInfer _),
    "ddl_external_table" -> (Ingest.qDdlExternalTable _),
    "json_scan"          -> (Ingest.qJsonScan _),
    "json_extract"       -> (Ingest.qJsonExtract _),
    "stream_window"      -> (graft.streaming.Streaming.qStreamWindow _),
    "binary_funcs"       -> (Multimodal.qBinaryFuncs _),
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
    "join_inner"     -> Joins.qJoinInnerSql,
    "join_broadcast" -> Joins.qJoinBroadcastSql,
    "join_semi"      -> Joins.qJoinSemiSql,
    "join_anti"      -> Joins.qJoinAntiSql,
    "join_left"      -> Joins.qJoinLeftSql,
    "join_right"     -> Joins.qJoinRightSql,
    "join_full"      -> Joins.qJoinFullSql,
    "union_all"      -> SetOps.qUnionAllSql,
    "union_distinct" -> SetOps.qUnionDistinctSql,
    "intersect"      -> SetOps.qIntersectSql,
    "except"         -> SetOps.qExceptSql,
    "union_by_name"  -> SetOps.qUnionByNameSql,
    "window_rank"    -> Windows.qWindowRankSql,
    "window_lag"     -> Windows.qWindowLagSql,
    "window_frame"   -> Windows.qWindowFrameSql,
    "window_ntile"   -> Windows.qWindowNtileSql,
    "string_funcs"   -> Scalars.qStringFuncsSql,
    "math_funcs"     -> Scalars.qMathFuncsSql,
    "date_funcs"     -> Scalars.qDateFuncsSql,
    "ts_arith"       -> Scalars.qTsArithSql,
    // hash_funcs: murmur3/xxhash64 are engine-specific — rows-only check
    "agg_stats"      -> Aggregates.qStatsSql,
    "percentile"     -> Aggregates.qPercentileSql,
    "distinct_agg"   -> Aggregates.qDistinctAggSql,
    "rollup"         -> Aggregates.qRollupSql,
    "cube"           -> Aggregates.qCubeSql,
    "grouping_sets"  -> Aggregates.qGroupingSetsSql,
    "collect"        -> Aggregates.qCollectSql,
    // approx_distinct: HLL sketch values are engine-specific — rows-only
    "sql_flagship"   -> Sql.flagshipSql,
    "sql_join"       -> Sql.joinSql,
    "sql_subquery"   -> Sql.subquerySql,
    "sql_case_when"  -> Sql.caseWhenSql,
    "udf_scalar"     -> Udfs.qUdfScalarSql,
    "udaf_geomean"   -> Udfs.qUdafGeoMeanSql,
    "array_funcs"    -> Arrays.qArrayFuncsSql,
    "array_explode"  -> Arrays.qArrayExplodeSql,
    "array_contains" -> Arrays.qArrayContainsSql,
    "text_stats"       -> TextAnalysis.qTextStatsSql,
    "text_quality"     -> TextAnalysis.qTextQualitySql,
    "lang_id"          -> TextAnalysis.qLangIdSql,
    "text_fingerprint" -> TextAnalysis.qTextFingerprintSql,
    "dedup_exact"   -> Dedup.qDedupExactSql,
    "dedup_minhash" -> Dedup.qDedupMinhashSql,
    "dedup_ngram"   -> Dedup.qDedupNgramSql,
    // dedup_simhash: signature values are engine-specific — rows-only
    "dedup_embed"   -> Dedup.qDedupEmbedSql,
    "knn_brute"     -> Similarity.qKnnBruteSql,
    // knn_ivf: cell assignment is engine-local approximation — rows-only
    "csv_scan"           -> Ingest.qCsvScanSql,
    "csv_infer"          -> Ingest.qCsvInferSql,
    "ddl_external_table" -> Ingest.qDdlExternalTableSql,
    "json_scan"          -> Ingest.qJsonScanSql,
    "json_extract"       -> Ingest.qJsonExtractSql,
    "stream_window"      -> graft.streaming.Streaming.qStreamWindowSql,
    "binary_funcs"       -> Multimodal.qBinaryFuncsSql,
  )
}
