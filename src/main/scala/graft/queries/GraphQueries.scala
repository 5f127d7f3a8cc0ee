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

  val defs: Map[String, QueryDef] = Map(
    "graph_pagerank" -> QueryDef(pagerank _, pagerankSql),
    "graph_degree"   -> QueryDef(degreeHist _, degreeHistSql),
  )
}
