package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Structural-graph invariants: bounded-round min-label components
  * recover exact components once rounds ≥ diameter, the bounded-hop
  * semantics below that, and degree-oriented triangle counting is
  * exact on known topologies — all bit-identical at any parallelism
  * (integer min / exact join-count, the DuckDB-replay contract).
  */
class GraphStructSpec extends SparkSpec {

  /** Two components: path 0-1-2-3 and triangle-pair clique 10,11,12,13
    * (K4 minus edge 11-13). */
  private def twoComps = {
    import spark.implicits._
    val one = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 12L), (10L, 13L),
    ).toDF("src", "dst")
    one.unionAll(one.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("min-label propagation recovers exact components once rounds ≥ diameter") {
    val labels = Graph.minLabelComponents(twoComps, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(labels(_) == 0L), s"path component: $labels")
    assert((10L to 13L).forall(labels(_) == 10L), s"clique component: $labels")
  }

  test("below the diameter, labels are exactly the min of the k-hop ball") {
    val labels = Graph.minLabelComponents(twoComps, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 only sees node 2 in one hop
    assert(labels(3L) == 2L)
    assert(labels(2L) == 1L)
    assert(labels(0L) == 0L)
  }

  test("labels are bit-identical across partitionings") {
    val a = Graph.minLabelComponents(twoComps.repartition(1), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.minLabelComponents(twoComps.repartition(7), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("triangle counts are exact on K4 minus an edge") {
    import spark.implicits._
    // K4 on {10..13} minus edge (11,13): triangles 10-11-12 and 10-12-13
    val und = Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 12L), (10L, 13L))
      .toDF("u", "v")
    val counts = Graph.triangleCounts(und)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(10L -> 2L, 12L -> 2L, 11L -> 1L, 13L -> 1L), s"$counts")
  }

  test("a triangle-free bipartite graph reports no triangles") {
    import spark.implicits._
    val und = Seq((0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L)).toDF("u", "v")
    assert(Graph.triangleCounts(und).count() == 0L)
  }

  test("hub skew cannot explode the wedge join: orientation bounds out-degree") {
    import spark.implicits._
    // star K1,20 plus one closing edge: hub degree 20, but oriented
    // out-degree of the hub must be ≤ 2 (only toward higher-(deg,id))
    val star = (1L to 20L).map(i => (0L, i)).toDF("u", "v")
    val closed = star.unionAll(Seq((1L, 2L)).toDF("u", "v"))
    val counts = Graph.triangleCounts(closed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"$counts")
  }
}
