package graft

import graft.functions.{TopKAggregate, VectorFunctions}
import graft.operators.Knn
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {

  test("keeps the k smallest with (dist, id) tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, 3.0, 10L), (1L, 1.0, 11L), (1L, 2.0, 12L),
      (1L, 2.0, 5L), (1L, 9.0, 13L),
      (2L, 0.5, 20L))
      .toDF("g", "d", "id")
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topK($"d", $"id", 3).as("t"))
      .select($"g", explode($"t").as("p"))
      .select($"g", $"p.dist", $"p.id")
      .orderBy($"g", $"p.dist", $"p.id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1.0, 11L), (1L, 2.0, 5L), (1L, 2.0, 12L),
      (2L, 0.5, 20L)))
  }

  test("aggregate batch knn equals window batch knn, both exclusion modes") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for (excl <- Seq(true, false)) {
      val agg = rows(Knn.topKBatch(emb, "vec_id", "embedding", q, "qid", "qvec",
        VectorFunctions.l2Distance, 5, excl))
      val win = rows(Knn.topKBatchWindow(emb, "vec_id", "embedding", q, "qid", "qvec",
        VectorFunctions.l2Distance, 5, excl))
      assert(agg == win, s"mismatch for excludeSelfMatches=$excl")
    }
  }
}
