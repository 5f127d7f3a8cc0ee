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
}
