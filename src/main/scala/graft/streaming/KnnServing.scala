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

  /** Semantically-cached serving: repeated (or near-repeated) query
    * vectors are answered from a cache of previously computed result
    * sets instead of re-scanning the store — the serving-layer
    * optimization for power-law query traffic, where a handful of hot
    * queries dominate. Per micro-batch:
    *
    *  1. every query checks the cache for its most similar cached
    *     query vector (cache broadcast — it is query-history-sized,
    *     never corpus-sized); cosine similarity ≥ 1 − `eps` is a HIT
    *     and replays the cached result set verbatim (`cache_hit` =
    *     true in the output — the consumer can see staleness);
    *  2. misses run ONE exact batched top-k against the store
    *     ([[Knn.topKBatch]]) and their result sets enter the cache
    *     (eagerly pinned, previous cache generation released — the
    *     foreachBatch sequence owns the lifecycle).
    *
    * With eps = 0 the cache only ever replays bit-identical queries,
    * so answers equal the uncached path exactly; eps > 0 trades
    * bounded query-side drift for hit rate (the classic semantic
    * cache contract). Store mutations invalidate nothing here — pair
    * with a fresh cache per store version (GraftTable versions give
    * the signal) in production.
    *
    * Output rows: (qIdCol, idCol, dist, cache_hit). */
  def serveCached(
      queries: DataFrame, store: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String, vecCol: String,
      k: Int, eps: Double)(writeBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val spark = store.sparkSession
    // cache: (c_vec array<double>, c_answers array<struct<id, dist>>)
    var cache: DataFrame = null
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val q = batch.select(col(qIdCol), col(qVecCol))
          val (hits, misses) =
            if (cache == null) (None, q)
            else {
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col(qIdCol)).orderBy(col("sim").desc, col("c_key"))
              val best = q.join(broadcast(cache))
                .select(col(qIdCol), col(qVecCol), col("c_key"), col("c_answers"),
                  VectorFunctions.cosineSimilarity(col(qVecCol), col("c_vec")).as("sim"))
                .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
              val hit = best.filter(col("sim") >= 1.0 - eps)
                .select(col(qIdCol), explode(col("c_answers")).as("a"))
                .select(col(qIdCol), col("a.id").as(idCol),
                  col("a.dist").as("dist"), lit(true).as("cache_hit"))
              (Some(hit), best.filter(col("sim") < 1.0 - eps)
                .select(col(qIdCol), col(qVecCol)))
            }
          val freshRows =
            if (misses.isEmpty) None
            else {
              val answered = Knn.topKBatch(
                store, idCol, vecCol, misses, qIdCol, qVecCol,
                VectorFunctions.cosineDistance, k, excludeSelfMatches = false)
              Some(answered.withColumn("cache_hit", lit(false)))
            }
          freshRows.foreach { fresh =>
            // admit the miss results; keyed by a stable hash of the
            // vector so re-admitting an identical query replaces itself
            val entries = fresh
              .groupBy(col(qIdCol))
              .agg(collect_list(struct(col(idCol).as("id"), col("dist"))).as("c_answers0"))
              .join(misses, qIdCol)
              .select(col(qVecCol).cast("array<double>").as("c_vec"),
                sort_array(col("c_answers0")).as("c_answers"))
              .withColumn("c_key", hash(col("c_vec")))
            val merged = (if (cache == null) entries
              else cache.unionByName(entries)
                .withColumn("rn", row_number().over(
                  org.apache.spark.sql.expressions.Window
                    .partitionBy(col("c_key")).orderBy(lit(1))))
                .filter(col("rn") === 1).drop("rn"))
              .localCheckpoint(true) // eager: the old generation can go
            if (cache != null) cache.unpersist()
            cache = merged
          }
          val out: Option[DataFrame] = (hits, freshRows) match {
            case (Some(h), Some(f)) => Some(h.unionByName(
              f.select(col(qIdCol), col(idCol), col("dist"), col("cache_hit"))))
            case (Some(h), None) => Some(h)
            case (None, Some(f)) =>
              Some(f.select(col(qIdCol), col(idCol), col("dist"), col("cache_hit")))
            case (None, None) => None // unreachable: a non-empty batch is hits ∪ misses
          }
          out.foreach(writeBatch(_, batchId))
        }
      }
      .start()
  }
}
