package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives beyond the random walk
  * ([[PageRank]]): connected components and triangle counting — the
  * two structural queries a training-data pipeline runs on its
  * link/co-occurrence graphs (dedup cluster audit, community-sized
  * sampling caps, spam-farm detection via closed-triad density).
  *
  * Determinism contract (SURVEY.md §3): both primitives are
  * transcendental-free integer algorithms — label propagation is a
  * `min` over longs, triangle counting is an exact join-count — so
  * results are bit-identical to the DuckDB oracle replays at any
  * parallelism.
  */
object Graph {

  /** Bounded-round min-label propagation: after `rounds` rounds each
    * node's label is the minimum node id within its `rounds`-hop
    * ball, so components of diameter ≤ `rounds` carry their exact
    * component id (= min member). Fixed-round, not convergence-tested
    * — the oracle must replay the identical round count (same
    * contract as [[PageRank.run]]); at production scale the caller
    * iterates `matWithCount` until the changed-label count hits zero
    * instead.
    *
    * Scale shape: edges are materialized once pre-partitioned on
    * `src`; every round shuffles only the (node, label) table — one
    * bounded node-sized shuffle per round, never the edge list. The
    * reduce is a map-side-combined `min`. Peak footprint: edges + 2
    * label tables (previous round released as the next materializes).
    *
    * `edges`: (src: long, dst: long) — symmetrized (both directions
    * present); nodes = distinct srcs.
    *
    * Returns (node: long, label: long). */
  def minLabelComponents(edges: DataFrame, rounds: Int,
      mat: Materializer = Materializer.local()): DataFrame = {
    require(rounds >= 1, "components needs at least one round")
    val e = mat.mat(
      edges.select(col("src"), col("dst")).repartition(col("src")),
      "cc-edges")
    var labels = mat.mat(
      e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")),
      "cc-l0")
    var i = 0
    while (i < rounds) {
      val next = mat.mat(
        e.join(labels, e("src") === labels("node"))
          .select(col("dst").as("node"), col("label"))
          .unionAll(labels.select(col("node"), col("label")))
          .groupBy(col("node")).agg(min(col("label")).as("label")),
        s"cc-r$i")
      mat.release(labels)
      labels = next
      i += 1
    }
    mat.release(e)
    labels
  }

  /** Exact per-node triangle counts via degree-ordered orientation
    * (the node-iterator bound of Schank & Wagner 2005): each
    * undirected edge is directed from its (deg, id)-smaller endpoint
    * to the larger, so every triangle a<b<c (in orientation order)
    * is enumerated exactly once as wedge (a→b, b→c) closed by a→c,
    * and the max out-degree — hence the wedge-join fan-out — is
    * O(√m) on any graph regardless of skew. That orientation is the
    * whole 100 TB story: the naive wedge join explodes on hub nodes
    * (deg² wedges); the oriented one provably cannot.
    *
    * `undirected`: (u: long, v: long) with u < v, one row per edge,
    * no duplicates.
    *
    * Returns (node: long, n_tri: long) for nodes in ≥1 triangle. */
  def triangleCounts(undirected: DataFrame): DataFrame = {
    val sym = undirected.select(col("u").as("s"), col("v").as("t"))
      .unionAll(undirected.select(col("v").as("s"), col("u").as("t")))
    val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lo → hi; the node-sized degree table
    // (nodes ≪ edges) is the hash-build side
    val o = undirected
      .join(deg.select(col("s").as("u"), col("deg").as("du")).hint("shuffle_hash"), "u")
      .join(deg.select(col("s").as("v"), col("deg").as("dv")).hint("shuffle_hash"), "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("hi"))
    // shuffled-hash, not sort-merge: pure-equality edge⋈edge joins
    // gain nothing from the sort, and the oriented out-edge build
    // side is degree-bounded (≤ O(√m) per node), so the per-partition
    // hash table cannot blow up even on skewed graphs
    val e1 = o.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = o.select(col("lo").as("b2"), col("hi").as("c")).hint("shuffle_hash")
    val e3 = o.select(col("lo").as("a3"), col("hi").as("c3")).hint("shuffle_hash")
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
