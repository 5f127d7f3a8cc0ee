package graft.streaming

import graft.functions.VectorFunctions
import graft.operators.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming KNN serving: answer a stream of query vectors against a
  * (static) vector store — the closest Spark-native analogue of the
  * reference's online search endpoint
  * (SSEOpenAIController.findMostSimilarString).
  *
  * Each micro-batch of queries runs one batched exact top-k against
  * the store ([[Knn.topKBatch]] — bounded map-side aggregate), so
  * serving cost per batch is one corpus scan regardless of the number
  * of queries in the batch. With an IVF/bucketed store layout the scan
  * prunes to probed cells. Results append to `sink` (parquet path,
  * memory table, …) via foreachBatch.
  */
object KnnServing {

  /** @param queries streaming frame with (qIdCol, qVecCol)
    * @param store   static corpus with (idCol, vecCol)
    * @param writeBatch persists one answered micro-batch */
  def serve(
      queries: DataFrame, store: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, vecCol: String,
      k: Int)(writeBatch: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val answered = Knn.topKBatch(
            store, idCol, vecCol,
            batch, qIdCol, qVecCol,
            VectorFunctions.cosineDistance, k,
            // request ids and store ids are unrelated id spaces
            excludeSelfMatches = false)
          writeBatch(answered, batchId)
        }
      }
      .start()

  /** IVF-probed serving: the 100 TB path. Each micro-batch runs
    * [[graft.operators.IvfIndex.searchBatch]] against a
    * cell-partitioned store — every query probes its nprobe nearest
    * cells via the cell-bucket join, so per-batch cost is
    * queries × nprobe × (N/nlist) candidate rows instead of a full
    * corpus scan per batch. Same approximation contract as every IVF
    * probe (cell recall; exact within probed cells). L2 metric (the
    * metric the cells were built with). */
  def serveIvf(
      queries: DataFrame, store: DataFrame, centroids: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, vecCol: String,
      k: Int, nprobe: Int)(writeBatch: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val answered = graft.operators.IvfIndex.searchBatch(
            store, idCol, vecCol, centroids,
            batch, qIdCol, qVecCol,
            VectorFunctions.l2Distance, k, nprobe)
          writeBatch(answered, batchId)
        }
      }
      .start()

  /** The reference's FULL online flow as a stream (SSE analogue,
    * SSEOpenAIController.java:143-240: embed → top-k → per-hit
    * summarize → stream each hit's summary to the client): every
    * micro-batch answers its queries with one exact batched top-k,
    * joins ONLY the k hit documents per query (broadcast-scale), runs
    * the deterministic extractive summarizer
    * ([[graft.operators.Summarize]] — the zero-egress ChatGPT
    * stand-in), and emits summary rows ordered by
    * (query, hit_rank, pos) — the incremental per-hit arrival order
    * the reference streams over SSE. Per-batch cost: one store scan +
    * k·|queries| document joins; summarize work never touches the
    * corpus. */
  def serveSummarized(
      queries: DataFrame, store: DataFrame, docs: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, vecCol: String,
      docIdCol: String, textCol: String, terms: Seq[String],
      k: Int, m: Int = 2, windowTokens: Int = 12)(
      writeBatch: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions._
          val hits = Knn.topKBatch(store, idCol, vecCol,
            batch, qIdCol, qVecCol,
            VectorFunctions.cosineDistance, k, excludeSelfMatches = false)
          // hit_rank = the reference's SSE emission order per query
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(qIdCol)).orderBy(col("dist"), col(idCol))
          val ranked = hits.withColumn("hit_rank", row_number().over(w))
            // one summary scope per (query, hit): the same document hit
            // by two queries of a batch must summarize independently
            .withColumn("__hit_key",
              concat(col(qIdCol).cast("string"), lit("#"), col(idCol).cast("string")))
          val hitDocs = ranked
            .join(docs.select(col(docIdCol).as("__did"), col(textCol).as("__text")),
              col(idCol) === col("__did"))
            .drop("__did")
            .select(col("*"), graft.operators.Summarize.tokenWindows(
              graft.functions.TextFunctions.tokens(col("__text")), windowTokens)
              .as("__sents"))
            .drop("__text")
          val out = graft.operators.Summarize
            .extract(hitDocs, "__hit_key", "__sents", terms, m)
            .drop("__hit_key")
            .orderBy(col(qIdCol), col("hit_rank"), col("pos"))
          writeBatch(out, batchId)
        }
      }
      .start()

  /** HNSW-served streaming KNN — the modern high-recall serving
    * default: per micro-batch, the (small) query set is collected and
    * every partition graph is deserialized once to answer all of them
    * ([[graft.operators.Hnsw.searchBatch]]); per-batch cost is
    * P graph loads + |batch|·P beam walks, independent of corpus
    * row count. Graphs come from [[graft.operators.Hnsw
    * .buildPartitioned]] (optionally persisted via writeGraphs). */
  def serveHnsw(
      queries: DataFrame, graphs: DataFrame,
      qIdCol: String, qVecCol: String,
      k: Int, ef: Int = 64,
      maxBatch: Int = 65536)(writeBatch: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // the one driver-side collect in the serving family — bound
          // it explicitly so a mis-wired source (say, a corpus stream
          // routed into the query port) fails fast instead of OOMing
          // the driver. limit(maxBatch+1) keeps the guard itself
          // driver-bounded: at most maxBatch+1 rows ever land here.
          val rows = batch
            .select(org.apache.spark.sql.functions.col(qIdCol).cast("long"),
              org.apache.spark.sql.functions.col(qVecCol).cast("array<double>"))
            .limit(maxBatch + 1)
            .collect()
          require(rows.length <= maxBatch,
            s"serveHnsw micro-batch exceeds maxBatch=$maxBatch query " +
              "vectors; raise maxBatch or trigger smaller batches")
          val qs = rows
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          val answered = graft.operators.Hnsw.searchBatch(graphs, qs, k, ef)
            .withColumnRenamed("qid", qIdCol)
          writeBatch(answered, batchId)
        }
      }
      .start()
}
