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

  test("JaccardDistExpr matches a driver-side set-of-positions twin") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val store = spark.read.parquet(storePath)
    val qWords = BinaryQuant.pack(query)
    val got = store.select(col("vec_id"),
        toColumn(graft.functions.JaccardDistExpr(toExpression(col("bq")), qWords)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qSet = query.indices.filter(query(_) > 0.0).toSet
    val want = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        val v = r.getSeq[Double](1)
        val s = v.indices.filter(v(_) > 0.0).toSet
        val uni = (s | qSet).size
        r.getLong(0) -> (if (uni == 0) 0.0 else 1.0 - (s & qSet).size.toDouble / uni)
      }.toMap
    assert(got == want, "packed-word jaccard must equal the set twin exactly")
  }

  test("JaccardDistExpr edge cases: identical → 0, disjoint → 1, both-empty → 0") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    val a = Array(1.0, -1.0, 1.0, -1.0)   // bits {0,2}
    val b = Array(-1.0, 1.0, -1.0, 1.0)   // bits {1,3} — disjoint
    val z = Array(-1.0, -1.0, -1.0, -1.0) // no bits
    def jac(v: Array[Double], q: Array[Double]): Double =
      Seq(v.toSeq).toDF("v")
        .select(toColumn(graft.functions.JaccardDistExpr(
          graft.functions.SignPackExpr(toExpression(col("v"))),
          BinaryQuant.pack(q))).as("d"))
        .head.getDouble(0)
    assert(jac(a, a) == 0.0)
    assert(jac(a, b) == 1.0)
    assert(jac(z, z) == 0.0)
    assert(jac(a, z) == 1.0)
  }
}
