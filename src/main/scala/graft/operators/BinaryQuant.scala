package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary vector quantization — the pgvector `bit(n)` / binary-quant
  * search mode (and the usual first-stage filter in billion-scale
  * serving stacks): each vector collapses to its sign bits
  * ([[graft.functions.SignPackExpr]], 32× smaller than float32), the
  * corpus pass ranks by hamming distance (XOR + popcount over
  * ⌈dims/64⌉ longs — [[graft.functions.HammingDistExpr]]), and the
  * standard exact re-rank of the top-`rerank` shortlist recovers
  * recall, exactly like the PQ/ADC pipeline ([[PqIndex.search]]).
  *
  * Scale shape (two-phase, r7): the hamming pass scans a PERSISTED
  * (id, bq) store — 8 bytes per 64 dims, never the float vectors —
  * into a TakeOrderedAndProject heap; the exact re-rank then touches
  * only the top-`rerank` ids, pulled from the full corpus by an
  * `IN`-list pushed to the parquet scan (the shortlist is `rerank`
  * rows, a constant — collecting it is the same driver-bounded cost
  * as packing the query). This is what buys the 32× at 100 TB: phase
  * 1's scan IO is the packed words only (ReadSchema plan-asserted in
  * BinaryQuantSpec), phase 2's is `rerank` rows.
  *
  * For sign bits to carry signal the corpus should be roughly
  * centered (true for the synthetic gaussian embeddings and for most
  * learned embeddings); heavily-shifted corpora should mean-center
  * before packing. */
object BinaryQuant {

  /** Corpus + `bq` (packed sign bits, array<long>). */
  def quantize(corpus: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    corpus.withColumn("bq",
      toColumn(graft.functions.SignPackExpr(toExpression(col(vecCol)))))
  }

  /** Persist the packed-bits sidecar: (idCol, bq) ONLY — the whole
    * point is that the search-time scan never touches the float
    * column. One shuffle-free pass over the corpus at build time. */
  def writeStore(corpus: DataFrame, idCol: String, vecCol: String,
      path: String): Unit =
    quantize(corpus, vecCol)
      .select(col(idCol), col("bq"))
      .write.mode("overwrite").parquet(path)

  /** Driver-side twin of [[graft.functions.SignPackExpr]] for the
    * query vector. */
  def pack(v: Array[Double]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0.0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  /** Phase 1 as a lazy plan: hamming top-`n` over the (id, bq) store.
    * Exposed separately so BinaryQuantSpec can assert the executed
    * plan's ReadSchema carries the packed words and id only. */
  def shortlist(bqStore: DataFrame, idCol: String, query: Array[Double],
      n: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    bqStore
      .select(col(idCol),
        toColumn(graft.functions.HammingDistExpr(
          toExpression(col("bq")), pack(query))).as("hd"))
      .orderBy(col("hd"), col(idCol))
      .limit(n)
  }

  /** Two-phase top-k: hamming shortlist over the packed store, exact
    * L2 re-rank of the `rerank` survivors read back from `corpus`.
    * Output (idCol, dist) ordered by (dist, id) — `dist` is the exact
    * L2 of the re-ranked survivors. The shortlist ids are collected
    * (`rerank` rows — bounded by the parameter, not the corpus) and
    * pushed into the corpus scan as an `In` filter, so phase 2 reads
    * `rerank` rows instead of joining the full store. */
  def search(bqStore: DataFrame, corpus: DataFrame, idCol: String,
      query: Array[Double], k: Int, rerank: Int,
      vecCol: String = "embedding"): DataFrame = {
    val ids = shortlist(bqStore, idCol, query, math.max(k, rerank))
      .select(col(idCol)).collect().map(_.get(0))
    corpus
      .filter(col(idCol).isin(ids: _*))
      .select(col(idCol),
        graft.functions.VectorDistance.l2(col(vecCol), typedLit(query.toSeq)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
