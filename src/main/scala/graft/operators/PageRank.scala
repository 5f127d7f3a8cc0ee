package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al., 1999) in integer fixed-point —
  * the graph-importance signal a training-data pipeline uses for
  * source weighting (quality ∝ link authority, the original
  * WebText/CCNet-style "karma" filter).
  *
  * Determinism contract (SURVEY.md §3): scores are BIGINT in units of
  * 1/[[Scale]] — every per-edge contribution is exact integer
  * arithmetic (`(score · 85 div 100) div deg`) and the per-node
  * reduce is a sum of longs, order-independent across partitions and
  * therefore bit-identical to the DuckDB oracle's unrolled-CTE
  * replay. Transcendental-free, float-free: no accumulation-order
  * hazard at any parallelism. (The usual double-precision PageRank
  * cannot hash-match across engines; the fixed-point floors cost
  * ≤ deg nano-units per node per round — noise at rank granularity.)
  *
  * Scale shape: the edge list is materialized ONCE pre-partitioned on
  * `src` ([[Materializer]] — parquet for fault-tolerant 100 TB runs),
  * so every iteration's score join shuffles only the score table
  * (nodes ≪ edges) into the edges' existing layout; the per-dst
  * reduce is a map-side-combined groupBy. Per round: one bounded
  * shuffle of node rows, never the edge list. Rounds are sequential
  * jobs with the previous round's blocks released as soon as the next
  * materializes — peak footprint is edges + 2 score tables.
  *
  * Overflow headroom: total mass converges to nodes·[[Scale]];
  * intermediate `score·85` therefore stays < 2^63 up to ~10^8 nodes
  * at Scale=1e9 — at larger graphs drop Scale a decade per 10×.
  */
object PageRank {

  /** Fixed-point unit: score 1.0 ≡ 1e9. */
  val Scale = 1000000000L

  /** `edges`: (src: long, dst: long) — directed; callers wanting the
    * undirected walk union both directions first. Every node must
    * appear as a src (true for symmetrized graphs); dangling nodes
    * would silently leak mass otherwise, so they are rejected by
    * construction: nodes = distinct srcs, and contributions only
    * flow to dsts that are also srcs.
    *
    * Returns (node: long, score: long) after exactly `iters` rounds
    * (fixed-round, not convergence-tested — the oracle must replay
    * the identical round count). */
  def run(edges: DataFrame, iters: Int,
      mat: Materializer = Materializer.local()): DataFrame = {
    require(iters >= 1, "pagerank needs at least one round")
    // one materialization of the (src, dst, deg) join layout: the
    // loop below re-reads it every round without recomputation
    val e = mat.mat(edges.select(col("src"), col("dst")), "pr-edges")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgeDeg = mat.mat(
      e.join(deg, "src").select(col("src"), col("dst"), col("deg"))
        .repartition(col("src")),
      "pr-edgedeg")
    mat.release(e)
    var scores = mat.mat(
      edgeDeg.select(col("src").as("node")).distinct()
        .select(col("node"), lit(Scale).as("score")),
      "pr-scores0")
    var i = 0
    while (i < iters) {
      // SHUFFLE_HASH on the score side: past the autoBroadcast
      // threshold Spark would otherwise plan the round as a
      // SortMergeJoin and RE-SORT the edge list every round —
      // measured 20.7× (super-linear) at the sf10 probe vs 10×
      // data, where sub-broadcast score tables scale ~linearly.
      // A per-partition hash build over the (nodes ≪ edges) score
      // side is the declared design: the edge layout is reused, the
      // per-round shuffle is the score table only, and no round
      // sorts anything. (Strategy choice cannot move a value: all
      // arithmetic is fixed-point integer.)
      val next = mat.mat(
        edgeDeg.join(scores.hint("shuffle_hash"),
            edgeDeg("src") === scores("node"))
          .select(col("dst"),
            expr("(score * 85 div 100) div deg").as("c"))
          .groupBy(col("dst"))
          .agg((sum(col("c")) + lit(15L * Scale / 100L)).as("score"))
          .select(col("dst").as("node"), col("score")),
        s"pr-round$i")
      mat.release(scores)
      scores = next
      i += 1
    }
    mat.release(edgeDeg)
    scores
  }
}
