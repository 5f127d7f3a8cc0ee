package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank invariants: authority ordering on a known
  * topology, symmetry (structurally equivalent nodes get IDENTICAL
  * integer scores — floats could not promise that), and partition
  * independence (long sums are order-independent, so the result is
  * bit-identical at any parallelism — the property the DuckDB oracle
  * replay relies on).
  */
class GraphPrSpec extends SparkSpec {

  /** Undirected star: hub 0 — spokes 1..4. */
  private def star = {
    import spark.implicits._
    val one = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    one.unionAll(one.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hub outranks spokes and structurally equivalent spokes tie exactly") {
    val scores = PageRank.run(star, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.size == 5)
    val spokes = (1L to 4L).map(scores)
    assert(spokes.distinct.size == 1,
      s"symmetric spokes must tie bit-exactly: $spokes")
    assert(scores(0L) > spokes.head, "the hub must collect the authority")
  }

  test("scores are bit-identical across partitionings") {
    val a = PageRank.run(star.repartition(1), iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = PageRank.run(star.repartition(7), iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "integer fixed-point must be partition-count independent")
  }

  test("mass bounds: every node keeps the base mass, total stays under nodes·Scale") {
    val scores = PageRank.run(star, iters = 5).collect().map(_.getLong(1))
    val base = 15L * PageRank.Scale / 100L
    assert(scores.forall(_ >= base), "every node holds at least (1-d)·Scale")
    assert(scores.sum <= scores.length * PageRank.Scale,
      "integer floors only ever LOSE mass relative to the N·Scale fixed point")
  }

  test("graph_pagerank inventory entry: top-20, rank-ordered, both node families present") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, Sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getLong(2))
    assert(scores.sameElements(scores.sorted.reverse), "must be score-descending")
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("customer", "supplier")))
  }
}
