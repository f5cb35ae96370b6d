package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.sources.Tables

/** Array/list-typed column surface (SURVEY §2.8 extension fns + §2.9
  * UDTF/generator). The reference has list types in the data model
  * (`cpp/src/arrow/type.h:121` ListType) and explode-style generators
  * only as kernels; here they are first-class over the `embeddings`
  * fixture's `list<float>` column — the prerequisite for the
  * similarity-search tier (Similarity.scala).
  *
  * Scale posture: all of these are per-row expressions inside
  * whole-stage codegen (no shuffle at all except the final oracle
  * ORDER BY); explode is Spark's Generate operator, which streams —
  * no row buffering.
  */
object Arrays {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Arrow EXTENSION-type mapping (`cpp/src/arrow/extension_type.h`,
    * SURVEY §1.2): an extension type is a storage type plus metadata.
    * Spark's equivalent is column `Metadata` on the `StructField` —
    * here a `list<float>` embedding column annotated as a fixed-dim
    * vector. The annotation survives projections and a parquet
    * round-trip (Spark persists field metadata in the file footer),
    * which SessionSpec pins — so a downstream consumer can recover
    * the logical type without a side channel. */
  def annotateVector(df: DataFrame, column: String, dim: Int): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.ext_type", "vector.float32")
      .putLong("graft.dim", dim.toLong)
      .build()
    df.withColumn(column, col(column).as(column, meta))
  }

  /** size / element_at (1-based and -1) / array_min / array_max over
    * the embedding vectors. */
  def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), -1).as("last_v"),
        array_min(col("embedding")).as("min_v"),
        array_max(col("embedding")).as("max_v"))
      .orderBy("vec_id")

  val qArrayFuncsSql: String = """
    SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
      embedding[1] AS first_v, embedding[-1] AS last_v,
      list_min(embedding) AS min_v, list_max(embedding) AS max_v
    FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
  """.trim

  /** posexplode — the §2.9 UDTF/generator surface: vector → one row
    * per (position, value), 1-based to match the oracle's
    * generate_subscripts. */
  def qArrayExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast(IntegerType).as("pos"),
        col("col").as("val"))
      .orderBy("vec_id", "pos")

  val qArrayExplodeSql: String = """
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
      unnest(embedding) AS val
    FROM embeddings WHERE vec_id < 3 ORDER BY vec_id, pos
  """.trim

  /** split + array_contains over document text (string → list<string>
    * boundary, `cpp/src/arrow/compute/kernels` take/contains analogue). */
  def qArrayContains(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"),
        size(split(col("text"), " ")).as("n_tokens"))
      .orderBy("doc_id")

  val qArrayContainsSql: String = """
    SELECT doc_id, list_contains(string_split(text, ' '), 'spark') AS has_spark,
      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
  """.trim

  /** Map-typed columns (Arrow MAP, `cpp/src/arrow/type.h:136` →
    * MapType): per-user event_type→count map built with
    * map_from_entries over a sorted entry list (sorted so the map's
    * physical entry order is deterministic), probed with element_at /
    * cardinality. */
  def qMapFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("c")))))
        .as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_clicks"),
        size(col("m")).as("n_types"))
      .filter(col("user_id") < 20)
      .orderBy("user_id")

  val qMapFuncsSql: String = """
    WITH per AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
    m AS (SELECT user_id,
      map_from_entries(list_sort(list(struct_pack(key := event_type, value := c)))) AS mp
      FROM per GROUP BY user_id)
    SELECT user_id, CAST(coalesce(mp['click'][1], 0) AS BIGINT) AS n_clicks,
      CAST(cardinality(mp) AS INT) AS n_types
    FROM m WHERE user_id < 20 ORDER BY user_id
  """.trim

  /** Second map-algebra tier: map_filter, transform_values,
    * map_keys/entries — every result normalized to sorted entry
    * arrays, the only cross-engine-comparable representation of a
    * map (map iteration order is engine-internal). */
  def qMapFuncs2(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "events")
      .filter(col("user_id") < 15)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    per.groupBy(col("user_id"))
      .agg(
        map_from_entries(array_sort(collect_list(struct(col("event_type"), col("c")))))
          .as("m"),
        sum(col("c")).as("total"))
      .select(
        col("user_id"),
        array_sort(map_entries(map_filter(col("m"), (_, v) => v > 14)))
          .as("busy_entries"),
        array_sort(map_entries(transform_values(col("m"), (_, v) => v * 2)))
          .as("doubled"),
        array_sort(map_keys(col("m"))).as("keys_sorted"),
        col("total"))
      // Output boundary: entry arrays render as pinned "k:v,k:v"
      // strings (the harness compare can't sort by map/struct
      // columns); the map algebra above is unchanged.
      .select(
        col("user_id"),
        array_join(transform(col("busy_entries"),
          e => concat_ws(":", e("key"), e("value"))), ",").as("busy_entries"),
        array_join(transform(col("doubled"),
          e => concat_ws(":", e("key"), e("value"))), ",").as("doubled"),
        array_join(col("keys_sorted"), ",").as("keys_sorted"),
        col("total"))
      .orderBy("user_id")
  }

  val qMapFuncs2Sql: String = """
    WITH per AS (SELECT user_id, event_type, COUNT(*) AS c FROM events
                 WHERE user_id < 15 GROUP BY 1, 2),
    m AS (SELECT user_id,
            list_sort(list(struct_pack(key := event_type, value := c))) AS entries,
            CAST(SUM(c) AS BIGINT) AS total
          FROM per GROUP BY user_id)
    SELECT user_id,
      COALESCE(array_to_string(list_transform(
        list_filter(entries, e -> e.value > 14),
        e -> e.key || ':' || CAST(e.value AS VARCHAR)), ','), '') AS busy_entries,
      array_to_string(list_transform(entries,
        e -> e.key || ':' || CAST(e.value * 2 AS VARCHAR)), ',') AS doubled,
      array_to_string(list_sort(list_transform(entries, e -> e.key)), ',')
        AS keys_sorted,
      total
    FROM m ORDER BY user_id
  """.trim

  /** Second array-algebra tier (CK list kernels beyond the r1-r4
    * surface): set algebra (union/intersect/except — Spark preserves
    * appearance order, so every result is sort_array-normalized to
    * match the oracle), flatten, position search, distinct count. */
  def qArrayFuncs2(s: SparkSession, dir: String): DataFrame = {
    val xs = sort_array(array(col("n_nationkey") % 5, col("n_nationkey") % 3,
      lit(7), col("n_nationkey") % 5))
    val ys = sort_array(array(col("n_nationkey") % 3, lit(2), lit(7)))
    t(s, dir, "nation")
      .select(col("n_nationkey"), xs.as("xs"), ys.as("ys"))
      .select(
        col("n_nationkey"),
        sort_array(array_distinct(array_union(col("xs"), col("ys"))))
          .as("arr_union"),
        sort_array(array_distinct(array_intersect(col("xs"), col("ys"))))
          .as("arr_intersect"),
        sort_array(array_distinct(array_except(col("xs"), col("ys"))))
          .as("arr_except"),
        flatten(array(col("xs"), col("ys"))).as("flat"),
        array_position(col("xs"), 7).as("pos7"),
        size(array_distinct(col("xs"))).as("n_uniq"))
      // Output boundary: int arrays render as pinned CSV strings
      // (the harness compare can't sort by array columns); the set
      // algebra above is unchanged.
      .select(
        col("n_nationkey"),
        array_join(transform(col("arr_union"),
          x => x.cast(StringType)), ",").as("arr_union"),
        array_join(transform(col("arr_intersect"),
          x => x.cast(StringType)), ",").as("arr_intersect"),
        array_join(transform(col("arr_except"),
          x => x.cast(StringType)), ",").as("arr_except"),
        array_join(transform(col("flat"),
          x => x.cast(StringType)), ",").as("flat"),
        col("pos7"), col("n_uniq"))
      .orderBy(col("n_nationkey"))
  }

  val qArrayFuncs2Sql: String = """
    WITH a AS (SELECT n_nationkey,
        list_sort([n_nationkey % 5, n_nationkey % 3, 7, n_nationkey % 5]) AS xs,
        list_sort([n_nationkey % 3, 2, 7]) AS ys
      FROM nation)
    SELECT n_nationkey,
      array_to_string(list_sort(list_distinct(list_concat(xs, ys))), ',')
        AS arr_union,
      COALESCE(array_to_string(list_sort(list_distinct(
        list_intersect(xs, ys))), ','), '') AS arr_intersect,
      COALESCE(array_to_string(list_sort(list_distinct(
        list_filter(xs, x -> NOT list_contains(ys, x)))), ','), '') AS arr_except,
      array_to_string(flatten([xs, ys]), ',') AS flat,
      CAST(list_position(xs, 7) AS BIGINT) AS pos7,
      CAST(len(list_distinct(xs)) AS INT) AS n_uniq
    FROM a ORDER BY n_nationkey
  """.trim

  /** Lazy sequence generation (the reference's range/sequence table
    * producers, `datafusion` ValuesExec + Gandiva sequence lineage):
    * per-row `sequence(start, stop)` exploded with position. The
    * generator runs inside the scan stage — rows are produced
    * streaming per input row, never materialized driver-side. */
  def qSequenceGen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(col("n_nationkey"),
        posexplode(sequence(lit(0L), col("n_nationkey") % 4)))
      .withColumnRenamed("pos", "step_pos")
      .withColumnRenamed("col", "step")
      .orderBy(col("n_nationkey"), col("step_pos"))

  val qSequenceGenSql: String = """
    SELECT n_nationkey,
      CAST(g.step AS BIGINT) - 0 AS step,
      CAST(g.step AS INT) AS step_pos
    FROM nation, LATERAL unnest(generate_series(0, n_nationkey % 4)) AS g(step)
    ORDER BY n_nationkey, step_pos
  """.trim
}
