package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns — the
  * Spark-native form of the pgvector operators the reference queries
  * with (`<->` L2, `<=>` cosine distance, `<#>` negative inner
  * product; see reference SSEOpenAIController.java:316 `ORDER BY
  * embedding <-> ?::vector LIMIT 5`).
  *
  * Determinism contract (SURVEY.md §3): every element is cast
  * FLOAT→DOUBLE first and accumulated *sequentially in element
  * order*, which is bit-identical to DuckDB's
  * `list_dot_product/list_cosine_similarity/list_distance` over
  * `CAST(x AS DOUBLE[])` — so oracle comparisons need no float
  * tolerance.
  *
  * Implementation: Spark higher-order functions (`zip_with`,
  * `aggregate`, `transform`) — declarative, no UDF serialization, and
  * the fold is guaranteed left-to-right.
  */
object VectorFunctions {

  /** Cast any numeric array to array<double> element-wise. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product in double precision.
    * Delegates to the fused codegen expression ([[VectorDistance]]);
    * [[dotHof]] keeps the declarative higher-order-function form as
    * the executable spec both are tested against. */
  def dot(a: Column, b: Column): Column = VectorDistance.dot(a, b)

  /** Guard shared by the HOF twins: mismatched dimensions raise like
    * the codegen expression does (zip_with would silently null-pad). */
  private def sameDims(a: Column, b: Column, result: Column): Column =
    when(size(a) === size(b), result)
      .otherwise(raise_error(format_string(
        "vector dimension mismatch: %d vs %d", size(a), size(b))).cast("double"))

  def dotHof(a: Column, b: Column): Column =
    sameDims(a, b,
      aggregate(
        zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
        lit(0.0),
        (acc, x) => acc + x))

  /** Squared L2 norm of a vector. */
  def norm2(a: Column): Column =
    aggregate(
      transform(asDouble(a), x => x * x),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 (Euclidean) norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** pgvector `<->`: Euclidean distance (fused codegen). */
  def l2Distance(a: Column, b: Column): Column = VectorDistance.l2(a, b)

  /** pgvector `<+>` (≥0.7): L1 / taxicab distance (fused codegen). */
  def l1Distance(a: Column, b: Column): Column = VectorDistance.l1(a, b)

  def l2DistanceHof(a: Column, b: Column): Column =
    sameDims(a, b,
      sqrt(aggregate(
        zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
        lit(0.0),
        (acc, x) => acc + x)))

  /** Cosine similarity: dot / (|a| * |b|) (fused codegen). */
  def cosineSimilarity(a: Column, b: Column): Column =
    VectorDistance.cosineSimilarity(a, b)

  /** pgvector `<=>`: cosine distance = 1 - cosine similarity (fused
    * single-pass codegen: one loop, three accumulators). */
  def cosineDistance(a: Column, b: Column): Column =
    VectorDistance.cosineDistance(a, b)

  def cosineDistanceHof(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarityHof(a, b)

  /** pgvector `<#>`: negative inner product (so ORDER BY ascending
    * gives max-inner-product search). */
  def negativeInnerProduct(a: Column, b: Column): Column =
    -dot(a, b)

  /** cosine similarity in declarative HOF form (spec twin; clamped to
    * [-1, 1] like DuckDB/pgvector). */
  def cosineSimilarityHof(a: Column, b: Column): Column =
    greatest(lit(-1.0), least(lit(1.0), dotHof(a, b) / (norm(a) * norm(b))))

  /** L2-normalize a vector to unit length (double elements). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    // zero-safe (the Embedder trait contract): the zero vector
    // normalizes to itself, not to NaNs from 0/0
    transform(asDouble(a), x => when(n === lit(0.0), x).otherwise(x / n))
  }
}
