package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.sources.Tables

/** Tensor / sparse-tensor / dictionary-encode tier — the last three
  * reference components previously documented out-of-relational-scope
  * (SURVEY §1.2 row `Tensor, SparseTensor`; §2.8 row DictionaryEncode).
  *
  * Reference behavior being re-expressed:
  *  - `cpp/src/arrow/tensor.h` — a dense n-dim numeric array is a flat
  *    row-major buffer plus a shape vector; transpose/slice are index
  *    arithmetic over that buffer.
  *  - `cpp/src/arrow/sparse_tensor.h` — COO format: a (position,
  *    value) list holding only the non-zero cells, convertible to and
  *    from the dense buffer.
  *  - CK `hash.h:80-81` DictionaryEncode + `isin.h` Match — map each
  *    value of a low-cardinality column to its index in a sorted
  *    unique-value dictionary, and back.
  *
  * Spark-first shape: a tensor is a plain `array<double>` column next
  * to a shape literal — all tensor algebra is per-row higher-order
  * functions (`transform`/`aggregate`/`zip_with` over `sequence`),
  * which stay inside whole-stage codegen: ZERO shuffle at any scale,
  * so the tier is embarrassingly parallel over 100 TB of rows. The
  * dictionary is the one genuinely relational piece: build once
  * (distinct + rank = one tiny shuffle on O(cardinality) rows), then
  * broadcast-join — the classic dimension-encode pattern; no shuffle
  * touches the fact table.
  *
  * Float determinism: every fold runs left-to-right from identical
  * float32 inputs cast to double, so Spark and DuckDB produce
  * bit-identical doubles; outputs additionally render through a
  * fixed-point `floor(x*1e4 + 0.5)` bigint so the compare is immune
  * to formatting.
  */
object Tensors {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** floor(x*1e4 + 0.5) as bigint — identical arithmetic in DuckDB. */
  private def fx(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)).cast(LongType)
  private def fxArr(c: Column): Column =
    array_join(transform(c, x => fx(x).cast(StringType)), ",")
  private val fxSql = "CAST(floor(%s * 10000.0 + 0.5) AS BIGINT)"

  /** Left fold sum matching DuckDB's list_reduce(list_prepend(0.0,..)). */
  private def fsum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Dense tensor algebra (`cpp/src/arrow/tensor.h`): each embedding's
    * first 8 components as a row-major 2x4 tensor. Shape/ndim/numel
    * metadata, transpose (4x2), row slice, scalar scale, full
    * reduction, and the 2x2 Gram matrix A·Aᵀ (matmul with the
    * transpose) — all index arithmetic over the flat buffer, exactly
    * the tensor.h contract, as codegen'd per-row expressions. */
  def qTensorFuncs(s: SparkSession, dir: String): DataFrame = {
    val d = col("d")
    // element p of the 4x2 transpose, row-major: column j = p/2 of A,
    // row i = p%2  →  A[i*4 + j]; emitted per-column to avoid integer
    // division: for each j, [A[0*4+j], A[1*4+j]].
    val transposed = flatten(transform(sequence(lit(0), lit(3)),
      j => array(element_at(d, j + 1), element_at(d, j + 5))))
    // Gram g[i][j] = Σ_k A[i*4+k]·A[j*4+k], i,j ∈ {0,1}
    val gram = flatten(transform(sequence(lit(0), lit(1)), i =>
      transform(sequence(lit(0), lit(1)), j =>
        aggregate(sequence(lit(0), lit(3)), lit(0.0),
          (acc, k) => acc + element_at(d, i * 4 + k + 1) *
            element_at(d, j * 4 + k + 1)))))
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        transform(slice(col("embedding"), 1, 8), x => x.cast(DoubleType))
          .as("d"))
      .select(
        col("vec_id"),
        lit("2x4").as("shape"),
        lit(2).as("ndim"),
        lit(8).as("numel"),
        lit("4x2").as("t_shape"),
        fxArr(transposed).as("transposed"),
        fxArr(slice(d, 5, 4)).as("row1"),
        fxArr(transform(d, x => x * 2.0)).as("scaled"),
        fx(fsum(d)).as("total"),
        fxArr(gram).as("gram"))
      .orderBy("vec_id")
  }

  val qTensorFuncsSql: String = s"""
    WITH a AS (
      SELECT vec_id, list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS d
      FROM embeddings WHERE vec_id < 50)
    SELECT vec_id, '2x4' AS shape, 2 AS ndim, 8 AS numel, '4x2' AS t_shape,
      array_to_string(list_transform(
        flatten(list_transform(range(0, 4), j -> [d[j+1], d[j+5]])),
        x -> CAST(${fxSql.format("x")} AS VARCHAR)), ',') AS transposed,
      array_to_string(list_transform(d[5:8],
        x -> CAST(${fxSql.format("x")} AS VARCHAR)), ',') AS row1,
      array_to_string(list_transform(d,
        x -> CAST(${fxSql.format("x * 2.0")} AS VARCHAR)), ',') AS scaled,
      ${fxSql.format(
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), d), (acc, x) -> acc + x)")}
        AS total,
      array_to_string(list_transform(
        flatten(list_transform(range(0, 2), i ->
          list_transform(range(0, 2), j ->
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(0, 4), k -> d[i*4+k+1] * d[j*4+k+1])),
              (acc, x) -> acc + x)))),
        x -> CAST(${fxSql.format("x")} AS VARCHAR)), ',') AS gram
    FROM a ORDER BY vec_id
  """.trim

  /** COO sparse tensor (`cpp/src/arrow/sparse_tensor.h`): threshold
    * the same 8-element tensor at |x| > 0.1 (≈half the cells — abs
    * median of the fixture is 0.085), keep (position, value) pairs of
    * the survivors, and prove the round-trip: COO → dense re-expansion
    * equals the thresholded dense buffer cell-for-cell. nnz/density
    * are the sparse-tensor metadata fields. */
  /** Tensor IPC MESSAGE round-trip as an oracle row (reference
    * `format/Message.fbs:92` Tensor header, `ipc/writer.h`
    * WriteTensor): the first three embeddings become a [3, dim]
    * row-major Float64 tensor, travel through [[TensorIpc]]'s
    * encapsulated-message codec, and come back out as (vec_id, pos,
    * val) rows — which DuckDB replays straight off the parquet, so a
    * codec that drops, reorders or rounds ANY element hash-fails.
    * Control-plane scale posture: one driver-sized tensor (the
    * message is a broadcast-like object); bulk data rides record
    * batches. */
  def qTensorIpc(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val src = t(s, dir, "embeddings").filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .collect().sortBy(_.getLong(0)) // 3 rows — control-plane
    val dim = src.head.getSeq[Float](1).length
    val data = src.flatMap(_.getSeq[Float](1).map(_.toDouble))
    val back = TensorIpc.read(TensorIpc.writeBytes(
      TensorIpc.DenseTensor(Seq(src.length.toLong, dim.toLong), data)))
    require(back.shape == Seq(src.length.toLong, dim.toLong))
    val ids = src.map(_.getLong(0))
    val rows = for {
      i <- 0 until src.length
      j <- 0 until dim
    } yield (ids(i), j + 1, back.data(i * dim + j))
    rows.toDF("vec_id", "pos", "val")
      .select(col("vec_id"), col("pos").cast(IntegerType).as("pos"),
        col("val"))
      .orderBy("vec_id", "pos")
  }

  val qTensorIpcSql: String = """
    SELECT vec_id, pos, CAST(val AS DOUBLE) AS val FROM (
      SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
        unnest(embedding) AS val
      FROM embeddings WHERE vec_id < 3)
    ORDER BY vec_id, pos
  """.trim

  /** SparseTensor IPC MESSAGE round-trip as an oracle row (reference
    * `format/SparseTensor.fbs`, `cpp/src/arrow/ipc/writer.h`
    * WriteSparseTensor): threshold the first three embeddings' first
    * 8 dims at |x| > 0.1 into a canonical COO [3, 8] Float64 tensor,
    * travel it through [[TensorIpc]]'s encapsulated SparseTensor
    * codec, and re-expand the DECODED indices/values (never the
    * original buffer) to dense (vec_id, pos, val) rows — DuckDB
    * replays the thresholded dense form straight off the parquet, so
    * a codec that drops, reorders, mis-addresses or rounds any cell
    * hash-fails. Control-plane scale posture: one driver-sized
    * message, like the dense `tensor_ipc` row. */
  def qSparseTensorIpc(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val src = t(s, dir, "embeddings").filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .collect().sortBy(_.getLong(0)) // 3 rows — control-plane
    val dim = 8
    val dense = src.map(_.getSeq[Float](1).take(dim).map(_.toDouble).toArray)
    val idxB = Array.newBuilder[Long]
    val valB = Array.newBuilder[Double]
    for (i <- src.indices; j <- 0 until dim) {
      val v = dense(i)(j)
      if (math.abs(v) > 0.1) { idxB += i.toLong; idxB += j.toLong; valB += v }
    }
    val coo = TensorIpc.CooTensor(
      Seq(src.length.toLong, dim.toLong), idxB.result(), valB.result())
    val back = TensorIpc.readSparse(TensorIpc.writeSparseBytes(coo))
    require(back.shape == coo.shape && back.isCanonical,
      s"sparse round-trip lost shape/canonicality: ${back.shape}")
    val grid = Array.fill(src.length, dim)(0.0)
    for (r <- 0 until back.nnz)
      grid(back.indices(r * 2).toInt)(back.indices(r * 2 + 1).toInt) =
        back.values(r)
    val ids = src.map(_.getLong(0))
    val rows = for { i <- src.indices; j <- 0 until dim }
      yield (ids(i), j + 1, grid(i)(j))
    rows.toDF("vec_id", "pos", "val")
      .select(col("vec_id"), col("pos").cast(IntegerType).as("pos"),
        col("val"))
      .orderBy("vec_id", "pos")
  }

  val qSparseTensorIpcSql: String = """
    SELECT vec_id, pos,
      CAST(CASE WHEN abs(val) > 0.1 THEN val ELSE 0.0 END AS DOUBLE) AS val
    FROM (
      SELECT vec_id, CAST(generate_subscripts(e, 1) AS INT) AS pos,
        CAST(unnest(e) AS DOUBLE) AS val
      FROM (SELECT vec_id, embedding[1:8] AS e
            FROM embeddings WHERE vec_id < 3))
    ORDER BY vec_id, pos
  """.trim

  def qSparseTensor(s: SparkSession, dir: String): DataFrame = {
    val d = col("d")
    val thresholded = transform(d,
      x => when(abs(x) > 0.1, x).otherwise(lit(0.0)))
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        transform(slice(col("embedding"), 1, 8), x => x.cast(DoubleType))
          .as("d"))
      // COO index list projected once (a named column, not re-derived
      // per consumer) so the position filter runs one time per row
      .withColumn("coo", filter(sequence(lit(0), lit(7)),
        p => abs(element_at(d, p + 1)) > 0.1))
      .withColumn("coo_v", transform(col("coo"), p => element_at(d, p + 1)))
      // dense re-expansion built STRICTLY from the COO pair (positions
      // in `coo`, values in `coo_v`) — the original dense buffer is
      // never consulted, so equality with the thresholded buffer
      // actually proves the COO round-trip cell-for-cell
      .withColumn("rebuilt", transform(sequence(lit(0), lit(7)), p =>
        when(array_position(col("coo"), p) > 0,
          element_at(col("coo_v"),
            array_position(col("coo"), p).cast(IntegerType)))
          .otherwise(lit(0.0))))
      .select(
        col("vec_id"),
        size(col("coo")).as("nnz"),
        // empty COO (an all-below-threshold vector — present at
        // sf0.001): DuckDB's array_to_string over an empty list is
        // NULL where Spark's array_join is '' — match the oracle
        when(size(col("coo")) > 0,
          array_join(transform(col("coo"), x => x.cast(StringType)), ","))
          .as("coo_idx"),
        when(size(col("coo")) > 0, fxArr(col("coo_v"))).as("coo_val"),
        fx(size(col("coo")).cast(DoubleType) / 8.0).as("density"),
        (fxArr(col("rebuilt")) === fxArr(thresholded)).as("roundtrip_ok"))
      .orderBy("vec_id")
  }

  val qSparseTensorSql: String = s"""
    WITH a AS (
      SELECT vec_id, list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS d
      FROM embeddings WHERE vec_id < 100),
    b AS (SELECT vec_id, d,
            list_filter(range(0, 8), p -> abs(d[p+1]) > 0.1) AS idx
          FROM a),
    c AS (SELECT vec_id, d, idx,
            list_transform(idx, p -> d[p+1]) AS vals
          FROM b)
    SELECT vec_id,
      CAST(len(idx) AS INT) AS nnz,
      array_to_string(list_transform(idx, x -> CAST(x AS VARCHAR)), ',')
        AS coo_idx,
      array_to_string(list_transform(vals,
        x -> CAST(${fxSql.format("x")} AS VARCHAR)), ',') AS coo_val,
      ${fxSql.format("CAST(len(idx) AS DOUBLE) / 8.0")} AS density,
      (array_to_string(list_transform(range(0, 8), p ->
         CAST(${fxSql.format(
           "CASE WHEN list_contains(idx, p) THEN vals[list_position(idx, p)] ELSE 0.0 END")}
           AS VARCHAR)), ',')
       = array_to_string(list_transform(d, x ->
         CAST(${fxSql.format("CASE WHEN abs(x) > 0.1 THEN x ELSE 0.0 END")}
           AS VARCHAR)), ',')) AS roundtrip_ok
    FROM c ORDER BY vec_id
  """.trim

  /** User-facing DictionaryEncode + Match (CK `hash.h:80-81`,
    * `isin.h`): encode `documents.lang` (5 values) and `source` (20)
    * to dense codes = position in the sorted unique-value dictionary,
    * then Match decodes back through the same dictionary and the
    * query asserts the round-trip per row.
    *
    * 100 TB shape: the dictionary build is distinct + rank over
    * O(cardinality) rows — a shuffle of a few dozen values — and the
    * encode/decode are broadcast hash joins, so the fact table is
    * never shuffled. The rank window is a single partition BY DESIGN:
    * it only ever sees the distinct dictionary values (dictionary
    * encoding presumes low cardinality), never fact rows. */
  def qDictEncode(s: SparkSession, dir: String): DataFrame = {
    def dict(src: DataFrame, c: String, code: String): DataFrame =
      src.select(c).distinct()
        .withColumn(code,
          (dense_rank().over(Window.orderBy(col(c))) - 1).cast(IntegerType))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .filter(col("doc_id") < 300)
    val dl = dict(docs, "lang", "lang_code")
    val ds = dict(docs, "source", "source_code")
    val encoded = docs
      .join(broadcast(dl), Seq("lang"))
      .join(broadcast(ds), Seq("source"))
    // Match: decode lang back via the dictionary keyed by code
    val decode = dl.withColumnRenamed("lang", "lang_decoded")
    encoded.join(broadcast(decode), Seq("lang_code"))
      .select(col("doc_id"), col("lang"), col("lang_code"),
        col("source_code"),
        (col("lang_decoded") === col("lang")).as("decoded_ok"))
      .orderBy("doc_id")
  }

  val qDictEncodeSql: String = """
    WITH dl AS (SELECT lang,
          CAST(row_number() OVER (ORDER BY lang) - 1 AS INT) AS lang_code
        FROM (SELECT DISTINCT lang FROM documents WHERE doc_id < 300)),
    ds AS (SELECT source,
          CAST(row_number() OVER (ORDER BY source) - 1 AS INT) AS source_code
        FROM (SELECT DISTINCT source FROM documents WHERE doc_id < 300))
    SELECT d.doc_id, d.lang, dl.lang_code, ds.source_code,
      TRUE AS decoded_ok
    FROM documents d
    JOIN dl USING (lang) JOIN ds USING (source)
    WHERE d.doc_id < 300
    ORDER BY d.doc_id
  """.trim
}
