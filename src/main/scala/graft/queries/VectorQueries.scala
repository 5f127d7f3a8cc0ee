package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import graft.operators.{IvfIndex, Knn, LshAnn, PqIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-search inventory (SURVEY.md §2) — the pgvector side of the
  * reference (SSEOpenAIController.java:316 `ORDER BY embedding <->
  * ?::vector LIMIT 5`, and the `<=>` / `<#>` operators pgvector
  * defines on the same table).
  *
  * Oracle parity: DuckDB `list_distance` / `list_cosine_similarity` /
  * `list_dot_product` over `CAST(x AS DOUBLE[])` are bit-identical to
  * [[graft.functions.VectorFunctions]] (verified; SURVEY.md §3).
  */
object VectorQueries {

  private val K = 10

  private def queryVec(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") =!= 0)

  private def knnOracle(distSql: String, extra: String = ""): String = s"""
    SELECT e.vec_id AS vec_id, $distSql AS dist
    FROM embeddings e
    CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0 $extra
    ORDER BY dist, vec_id
    LIMIT $K"""

  private val l2Sql  = "list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))"
  private val cosSql = "1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))"
  private val ipSql  = "-list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))"

  private def knnL2(s: SparkSession, d: String): DataFrame =
    Knn.topK(corpus(s, d), "vec_id", "embedding", queryVec(s, d), "qvec", l2Distance, K)

  private def knnCos(s: SparkSession, d: String): DataFrame =
    Knn.topK(corpus(s, d), "vec_id", "embedding", queryVec(s, d), "qvec", cosineDistance, K)

  private def knnIp(s: SparkSession, d: String): DataFrame =
    Knn.topK(corpus(s, d), "vec_id", "embedding", queryVec(s, d), "qvec", negativeInnerProduct, K)

  // ----------------------------------------------------------- batch top-k
  private def knnBatch(s: SparkSession, d: String): DataFrame = {
    val q = Tables.embeddings(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Knn.topKBatch(Tables.embeddings(s, d), "vec_id", "embedding",
      q, "qid", "qvec", l2Distance, 5)
  }

  private val knnBatchSql = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    dists AS (
      SELECT q.qid, e.vec_id,
             list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS dist
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
      FROM dists)
    SELECT qid, vec_id, dist FROM ranked
    WHERE rn <= 5
    ORDER BY qid, dist, vec_id"""

  // ---------------------------------------------------------- range search
  private def rangeSearch(s: SparkSession, d: String): DataFrame =
    Knn.rangeSearch(corpus(s, d), "vec_id", "embedding",
      queryVec(s, d), "qvec", l2Distance, 1.30)

  private val rangeSearchSql = """
    SELECT e.vec_id AS vec_id,
           list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS dist
    FROM embeddings e
    CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
      AND list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) < 1.30
    ORDER BY dist, vec_id"""

  // -------------------------------------------------------------- IVF ANN
  /** Approximate: probes 4 of 16 k-means cells, so no SQL oracle —
    * recall vs brute force is asserted in IvfIndexSpec instead
    * (rows-only driver check). */
  private def ivfKnn(s: SparkSession, d: String): DataFrame = {
    val (indexed, centroids) =
      IvfIndex.buildIndex(Tables.embeddings(s, d), "vec_id", "embedding", nlist = 16)
    IvfIndex.search(indexed.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      centroids, queryVec(s, d), "qvec", l2Distance, k = K, nprobe = 4)
  }

  /** Approximate (bucket recall < 1) → rows-only; recall asserted in
    * LshAnnSpec. */
  private def lshKnn(s: SparkSession, d: String): DataFrame =
    LshAnn.search(corpus(s, d), "vec_id", "embedding",
      queryVec(s, d), "qvec", dims = 64, k = K, tables = 8, bits = 4)

  // ---------------------------------------------------------------- norms
  private def norms(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        sqrt(graft.functions.VectorDistance.dot(col("embedding"), col("embedding")))
          .as("nrm"))
      .orderBy(col("vec_id"))

  private val normsSql = """
    SELECT vec_id,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
    ORDER BY vec_id"""

  // ------------------------------------------------------------ centroids
  /** Per-label centroid (grouped vector mean) in relational form
    * (label, pos, centroid). Components are fixed-point quantized at
    * 2^-24 before summing so the mean is order-independent and
    * bit-identical across engines (double sums are not). */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("v").cast("double") * 16777216.0).cast("long").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sq").cast("double") / (col("n") * lit(16777216.0))).as("centroid"))
      .orderBy(col("label"), col("pos"))

  private val centroidsSql = """
    WITH x AS (
      SELECT label, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 16777216.0) AS BIGINT) AS q
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i))
    SELECT label, CAST(pos AS BIGINT) AS pos,
           CAST(sum(q) AS DOUBLE) / (count(*) * 16777216.0) AS centroid
    FROM x
    GROUP BY label, pos
    ORDER BY label, pos"""

  /** PQ/ADC compressed search (lossy → rows-only; recall asserted in
    * PqIndexSpec). */
  private def pqKnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = PqIndex.train(emb, "embedding", dims = 64, m = 8, ksub = 16)
    val encoded = PqIndex.encode(emb.filter(col("vec_id") =!= 0), "embedding", cb)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    PqIndex.search(encoded, "vec_id", query, cb, K)
  }

  val defs: Map[String, QueryDef] = Map(
    "vs_ivf_knn"      -> QueryDef(ivfKnn _, None),
    "vs_lsh_knn"      -> QueryDef(lshKnn _, None),
    "vs_pq_knn"       -> QueryDef(pqKnn _, None),
    "vs_norms"        -> QueryDef(norms _, normsSql),
    "emb_centroids"   -> QueryDef(centroids _, centroidsSql),
    "vs_knn_l2"       -> QueryDef(knnL2 _, knnOracle(l2Sql)),
    "vs_knn_cosine"   -> QueryDef(knnCos _, knnOracle(cosSql)),
    "vs_knn_ip"       -> QueryDef(knnIp _, knnOracle(ipSql)),
    "vs_knn_batch"    -> QueryDef(knnBatch _, knnBatchSql),
    "vs_range_search" -> QueryDef(rangeSearch _, rangeSearchSql),
  )
}
