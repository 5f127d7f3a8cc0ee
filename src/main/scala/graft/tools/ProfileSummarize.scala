package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the summarized-serving micro-batch
  * (VERDICT r13 #6): times the exact top-k term and then the
  * doc-fetch + summarize tail under BOTH fetch disciplines — the
  * pushed-In over the raw documents parquet and the range-clustered
  * GraftTable point read — so the doc component's corpus scaling is
  * a measured number instead of a subtraction of noisy totals.
  *
  * Usage: runMain graft.tools.ProfileSummarize <sfDir>
  */
object ProfileSummarize {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val store = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") =!= 0)
    val docs = graft.Tables.documents(spark, sfDir)
    val batch = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 1 && col("vec_id") <= 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val terms = Seq("join", "vector", "scan")
    val table = graft.streaming.ServingBench.ensureDocStore(spark, sfDir)
    // top-k term alone (collected — the same driver hop the batch pays)
    val hits = graft.operators.Knn.topKBatch(store, "vec_id", "embedding",
      batch, "qid", "qvec",
      graft.functions.VectorFunctions.cosineDistance, 5, excludeSelfMatches = false)
    var hitRows: Array[org.apache.spark.sql.Row] = null
    val tTopkCold = timed { hitRows = hits.collect() }
    val tTopkWarm = timed { hits.collect(); () }
    def tail(fetch: Seq[Any] => org.apache.spark.sql.DataFrame): Double =
      timed {
        graft.streaming.KnnServing.summarizeHits(spark, hitRows, hits.schema,
          fetch, "qid", "vec_id", "doc_id", "text", terms, 2, 12).count()
        ()
      }
    val rawFetch = (ids: Seq[Any]) => docs.filter(col("doc_id").isin(ids: _*))
    val tblFetch = (ids: Seq[Any]) => table.readWhere(col("doc_id").isin(ids: _*))
    val r1 = tail(rawFetch); val r2 = tail(rawFetch)
    val g1 = tail(tblFetch); val g2 = tail(tblFetch)
    println(f"[sumprof] sf=$sfDir topk_cold=$tTopkCold%.2f topk_warm=$tTopkWarm%.2f " +
      f"docs_raw=$r1%.2f/$r2%.2f docs_table=$g1%.2f/$g2%.2f s")
    spark.stop()
  }
}
