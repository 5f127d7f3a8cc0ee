package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics inventory (SURVEY.md §2): link-authority scoring
  * over the order graph — the web-graph-shaped workload a
  * training-data pipeline runs for source weighting (domain authority
  * → sampling weight), on the same engine as everything else instead
  * of a separate graph system.
  *
  * The graph: customer —bought-from→ supplier edges from
  * orders ⋈ lineitem, symmetrized (both directions) so the random
  * walk has no dangling mass. Node ids pack both families into one
  * key space (customer c → 2c, supplier s → 2s+1) so the score table
  * is a single (long, long) relation.
  */
object GraphQueries {

  private val PrIters = 5
  private val TopN = 20

  /** Symmetrized (src, dst) edge list. DISTINCT collapses repeat
    * purchases — multiplicity is a weighting choice, and unweighted
    * edges keep the per-edge contribution a pure function of the
    * src's degree (and the oracle replay trivially identical). */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val cs = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    cs.unionAll(cs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Fixed-point PageRank ([[graft.operators.PageRank]]) — 5 rounds,
    * top-20 authorities. Bit-exact against the unrolled-CTE DuckDB
    * replay because every contribution is integer arithmetic and
    * every reduce is a long sum (order-independent). */
  private def pagerank(s: SparkSession, d: String): DataFrame =
    graft.operators.PageRank.run(edges(s, d), PrIters)
      .select(col("node"),
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("kind"),
        col("score"))
      .orderBy(col("score").desc, col("node"))
      .limit(TopN)

  private val pagerankSql: String = {
    val base = 15L * graft.operators.PageRank.Scale / 100L
    def round(n: Int, prev: String) = s"""
    s$n AS (
      SELECT ed.dst AS node,
             CAST(sum(((p.score * 85) // 100) // ed.deg) + $base AS BIGINT) AS score
      FROM ed JOIN $prev p ON ed.src = p.node
      GROUP BY ed.dst)"""
    s"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
    s0 AS (SELECT DISTINCT src AS node, CAST(${graft.operators.PageRank.Scale} AS BIGINT) AS score FROM e),
    ${(1 to PrIters).map(i => round(i, s"s${i - 1}")).mkString(",")}
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           score
    FROM s$PrIters
    ORDER BY score DESC, node
    LIMIT $TopN"""
  }

  /** Degree histogram of the symmetric graph — the profiling query
    * behind skew decisions (a heavy-tailed degree distribution is
    * what forces salting / vertex-cut strategies at scale). Two
    * map-side-combined aggregates, no joins. */
  private def degreeHist(s: SparkSession, d: String): DataFrame =
    edges(s, d)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("deg"))

  private val degreeHistSql: String = """
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
    SELECT deg, count(*) AS n_nodes FROM deg GROUP BY deg ORDER BY deg"""

  // ------------------------------------------------- connected components
  private val CcRounds = 8
  private val CcPriceThr = 104000

  /** High-value trade graph: customer—supplier edges restricted to
    * lineitems above [[CcPriceThr]] — thinning by value is what keeps
    * the component structure non-trivial (the full bipartite graph is
    * one giant component at every SF) and mirrors the production use:
    * components over a *filtered* relation (near-dup pairs, same-site
    * links), not the raw firehose. */
  private def ccEdges(s: SparkSession, d: String): DataFrame = {
    val cs = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(
        Tables.lineitem(s, d)
          .filter(col("l_extendedprice") > CcPriceThr)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    cs.unionAll(cs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Component-size census after [[CcRounds]] rounds of min-label
    * propagation ([[graft.operators.Graph.minLabelComponents]]) —
    * components of diameter ≤ 8 report their exact (min-id, size);
    * the fixed round count keeps the DuckDB unrolled-CTE replay
    * bit-identical (same contract as graph_pagerank). */
  private def components(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.minLabelComponents(ccEdges(s, d), CcRounds)
      .groupBy(col("label").as("comp")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("comp"))

  private val componentsSql: String = {
    def round(n: Int, prev: String) = s"""
    l$n AS (
      SELECT node, min(label) AS label FROM (
        SELECT e.dst AS node, p.label FROM e JOIN $prev p ON e.src = p.node
        UNION ALL SELECT node, label FROM $prev)
      GROUP BY node)"""
    s"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_extendedprice > $CcPriceThr),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
    ${(1 to CcRounds).map(i => round(i, s"l${i - 1}")).mkString(",")}
    SELECT label AS comp, count(*) AS size
    FROM l$CcRounds
    GROUP BY comp
    ORDER BY size DESC, comp"""
  }

  // ---------------------------------------------------- triangle counting
  private val TriQtyThr = 40
  private val TriTopN = 20

  /** Part co-occurrence graph: parts appearing together in an order's
    * high-quantity lineitems (the market-basket graph). Distinct
    * unordered pairs, u < v. */
  private def triEdges(s: SparkSession, d: String): DataFrame = {
    val po = Tables.lineitem(s, d)
      .filter(col("l_quantity") > TriQtyThr)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    po.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(po.select(col("l_orderkey").as("ok2"), col("l_partkey").as("v")),
        col("l_orderkey") === col("ok2") && col("u") < col("v"))
      .select(col("u"), col("v"))
      .distinct()
  }

  /** Top-[[TriTopN]] parts by exact triangle count
    * ([[graft.operators.Graph.triangleCounts]] — degree-ordered
    * orientation, O(√m) wedge fan-out). */
  private def triangles(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.triangleCounts(triEdges(s, d))
      .select(col("node").as("p_partkey"), col("n_tri"))
      .orderBy(col("n_tri").desc, col("p_partkey"))
      .limit(TriTopN)

  private val trianglesSql: String = s"""
    WITH po AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > $TriQtyThr),
    p0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    sym AS (SELECT u AS s, v AS t FROM p0 UNION ALL SELECT v AS s, u AS t FROM p0),
    deg AS (SELECT s AS node, count(*) AS deg FROM sym GROUP BY s),
    o AS (
      SELECT CASE WHEN (du.deg, u) < (dv.deg, v) THEN u ELSE v END AS lo,
             CASE WHEN (du.deg, u) < (dv.deg, v) THEN v ELSE u END AS hi
      FROM p0 JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
    tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM o e1 JOIN o e2 ON e1.hi = e2.lo
      JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    pn AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
    SELECT node AS p_partkey, count(*) AS n_tri
    FROM pn GROUP BY node
    ORDER BY n_tri DESC, p_partkey
    LIMIT $TriTopN"""

  val defs: Map[String, QueryDef] = Map(
    "graph_pagerank"   -> QueryDef(pagerank _, pagerankSql),
    "graph_degree"     -> QueryDef(degreeHist _, degreeHistSql),
    "graph_components" -> QueryDef(components _, componentsSql),
    "graph_triangles"  -> QueryDef(triangles _, trianglesSql),
  )
}
