package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (brute-force) vector search — the Spark-native form of the
  * reference's `ORDER BY embedding <-> ?::vector LIMIT 5`
  * (SSEOpenAIController.java:316).
  *
  * Scale design (SURVEY.md §4):
  *  - single query: the 1-row query side is broadcast, the corpus is
  *    scanned once, and `orderBy(dist).limit(k)` plans as
  *    `TakeOrderedAndProject` — a bounded per-partition heap merged on
  *    the driver. No corpus shuffle, no full sort, O(k) driver memory.
  *  - batch: Q query vectors broadcast against one corpus scan; the
  *    per-query top-k runs through the bounded
  *    [[graft.functions.TopKAggregate]] — the map side keeps ≤ k
  *    pairs per query per partition, so the shuffle is
  *    partitions × Q × k rows, corpus-size independent. For large Q
  *    at 100 TB, prefer [[graft.operators.IvfIndex]] which prunes
  *    the scanned fraction to nprobe/nlist first.
  *  - range search: a pure filter — fully pipelined, no shuffle.
  */
object Knn {

  /** Exact top-k nearest of `queryVec` (a 1-row frame holding column
    * `qVecCol`) in `corpus`, with deterministic distance-then-id
    * ordering. Output: (idCol, dist). */
  def topK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, qVecCol: String,
      distance: (Column, Column) => Column, k: Int): DataFrame =
    corpus
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), distance(col(vecCol), col(qVecCol)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Exact top-k for each of many query vectors; `queries` holds
    * (qIdCol, qVecCol). Output: (qIdCol, idCol, dist) ordered by
    * (qid, dist, id). Excludes self-matches when ids collide.
    *
    * Uses the bounded [[graft.functions.TopKAggregate]]: the partial
    * (map-side) aggregate keeps ≤ k pairs per query per partition, so
    * the shuffle is partitions × queries × k rows — independent of
    * corpus size, unlike the window row_number plan
    * ([[topKBatchWindow]]) which shuffles every candidate row. */
  def topKBatch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      distance: (Column, Column) => Column, k: Int,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
    // excludeSelfMatches is for corpus-vs-itself queries where qid and
    // id share an id space; serving flows with unrelated id spaces
    // MUST pass false or colliding request ids silently lose a hit
    val candidates =
      if (excludeSelfMatches) joined.filter(col(idCol) =!= col(qIdCol)) else joined
    candidates
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAggregate.topK(
        distance(col(vecCol), col(qVecCol)), col(idCol).cast("long"), k).as("topk"))
      .select(col(qIdCol), explode(col("topk")).as("p"))
      .select(col(qIdCol), col("p.id").as(idCol), col("p.dist").as("dist"))
      .orderBy(col(qIdCol), col("dist"), col(idCol))
  }

  /** Window-based batch top-k (reference plan for the aggregate). */
  def topKBatchWindow(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      distance: (Column, Column) => Column, k: Int,
      excludeSelfMatches: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("dist"), col(idCol))
    val joined = corpus.crossJoin(broadcast(queries))
    val candidates =
      if (excludeSelfMatches) joined.filter(col(idCol) =!= col(qIdCol)) else joined
    candidates
      .select(col(qIdCol), col(idCol), distance(col(vecCol), col(qVecCol)).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .orderBy(col(qIdCol), col("dist"), col(idCol))
  }

  /** pgvector-style range predicate: all corpus vectors with
    * distance(v, q) < tau. Pure filter — no shuffle. */
  def rangeSearch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, qVecCol: String,
      distance: (Column, Column) => Column, tau: Double): DataFrame =
    corpus
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), distance(col(vecCol), col(qVecCol)).as("dist"))
      .filter(col("dist") < tau)
      .orderBy(col("dist"), col(idCol))
}
