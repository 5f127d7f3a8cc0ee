package graft

import graft.operators.BinaryQuant
import org.apache.spark.sql.functions._

/** Proof that the two-phase binary-quant search delivers its own IO
  * story: the hamming pass scans the persisted (id, packed-bits)
  * sidecar and NEVER the float embedding column (that's the 32×), and
  * the exact re-rank reaches the corpus through a pushed `In` filter
  * over the `rerank` shortlist ids — so at 100 TB phase 1's scan IO
  * is 8 bytes per 64 dims and phase 2's is a constant row count. */
class BinaryQuantSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, Sf)
  private lazy val query: Array[Double] = emb.filter(col("vec_id") === 0)
    .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray

  private lazy val storePath: String = {
    val p = new java.io.File(sys.props("java.io.tmpdir"), "graft_bq_spec").toString
    BinaryQuant.writeStore(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", p)
    p
  }

  test("phase-1 hamming scan reads (vec_id, bq) only — ReadSchema excludes the embedding column") {
    val store = spark.read.parquet(storePath)
    val plan = BinaryQuant.shortlist(store, "vec_id", query, 192)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), s"expected a file scan:\n$plan")
    assert(!plan.contains("embedding"),
      s"hamming pass must not touch the float column:\n$plan")
    assert(plan.contains("bq"), s"hamming pass must read the packed words:\n$plan")
  }

  test("phase-2 re-rank reaches the corpus through a pushed In filter on the shortlist ids") {
    val store = spark.read.parquet(storePath)
    val result = BinaryQuant.search(store, emb.filter(col("vec_id") =!= 0),
      "vec_id", query, k = 10, rerank = 192)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"shortlist ids must push into the corpus scan:\n$plan")
    val rows = result.collect()
    assert(rows.length == 10)
    val dists = rows.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted), "output must be distance-ordered")
  }

  test("two-phase search ≡ single-pass hamming+rerank on the same corpus") {
    val store = spark.read.parquet(storePath)
    val twoPhase = BinaryQuant.search(store, emb.filter(col("vec_id") =!= 0),
      "vec_id", query, k = 10, rerank = 192)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // reference semantics: hamming top-192 over the same packed bits,
    // then exact L2 top-10 — computed inline (the r6 single-pass shape)
    val inline = BinaryQuant.quantize(emb.filter(col("vec_id") =!= 0), "embedding")
    val single = BinaryQuant.search(
      inline.select(col("vec_id"), col("bq")),
      emb.filter(col("vec_id") =!= 0), "vec_id", query, k = 10, rerank = 192)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(twoPhase == single,
      "persisted sidecar must give bit-identical results to inline packing")
  }
}
