package graft

import graft.functions.VectorFunctions
import graft.operators.{Knn, PqIndex}
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, Sf)

  test("codes are m small ints (64x compression of the float vector)") {
    val cb = PqIndex.train(emb, "embedding", dims = 64, m = 8, ksub = 16)
    val encoded = PqIndex.encode(emb, "embedding", cb)
    val row = encoded.select("codes").head.getSeq[Int](0)
    assert(row.length == 8)
    assert(row.forall(c => c >= 0 && c < 16))
    assert(encoded.count() == emb.count())
  }

  test("ADC search recalls a useful fraction of exact top-k") {
    val cb = PqIndex.train(emb, "embedding", dims = 64, m = 8, ksub = 16)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val encoded = PqIndex.encode(corpus, "embedding", cb)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = Knn.topK(corpus, "vec_id", "embedding", q, "qvec",
      VectorFunctions.l2Distance, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // PQ is lossy: measure recall of exact top-10 within ADC top-50
    val approx = PqIndex.search(encoded, "vec_id", query, cb, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("encode plan is shuffle-free: no exchange, no window (r6 kernel discipline)") {
    val cb = PqIndex.train(emb, "embedding", dims = 64, m = 16, ksub = 32)
    val encoded = PqIndex.encode(emb, "embedding", cb)
    encoded.collect() // finalize any adaptive plan before inspecting
    val plan = encoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"), s"encode shuffles:\n$plan")
    assert(!plan.contains("Window"), s"encode uses a window:\n$plan")
  }
}
