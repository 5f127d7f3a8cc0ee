package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape: the quantize pass is per-row and shuffle-free; the
  * search scans only the packed words (8 bytes per 64 dims) plus a
  * TakeOrderedAndProject heap, and touches `rerank` full vectors —
  * a constant, corpus-independent cost. For sign bits to carry
  * signal the corpus should be roughly centered (true for the
  * synthetic gaussian embeddings and for most learned embeddings);
  * heavily-shifted corpora should mean-center before packing. */
object BinaryQuant {

  /** Corpus + `bq` (packed sign bits, array<long>). */
  def quantize(corpus: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    corpus.withColumn("bq",
      toColumn(graft.functions.SignPackExpr(toExpression(col(vecCol)))))
  }

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

  /** Hamming shortlist + exact re-rank top-k. Output (idCol, dist)
    * ordered by (dist, id) — `dist` is the exact L2 of the re-ranked
    * survivors. */
  def search(quantized: DataFrame, idCol: String, query: Array[Double],
      k: Int, rerank: Int, vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    quantized
      .select(col(idCol), col(vecCol),
        toColumn(graft.functions.HammingDistExpr(
          toExpression(col("bq")), pack(query))).as("hd"))
      .orderBy(col("hd"), col(idCol))
      .limit(math.max(k, rerank))
      .select(col(idCol),
        graft.functions.VectorDistance.l2(col(vecCol), typedLit(query.toSeq)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
