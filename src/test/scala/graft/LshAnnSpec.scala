package graft

import graft.functions.TextFunctions
import graft.functions.VectorFunctions._
import graft.operators.{Knn, LshAnn}
import org.apache.spark.sql.functions._

class LshAnnSpec extends SparkSpec {

  test("hash64Scala is the engine hash (plan-time constants are honest)") {
    import spark.implicits._
    val inputs = Seq("0:0:0", "3:11:63", "hello world", "")
    val engine = inputs.toDF("s")
      .select(TextFunctions.hash64(col("s"))).collect().map(_.getLong(0))
    val jvm = inputs.map(TextFunctions.hash64Scala)
    assert(engine.toSeq == jvm)
  }

  test("bucket rows: one signature per table per vector") {
    val emb = Tables.embeddings(spark, Sf).limit(100)
    val rows = LshAnn.bucketRows(emb, "vec_id", "embedding", tables = 3, bits = 8, dims = 64)
    assert(rows.count() == 300)
    assert(rows.groupBy("vec_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("LSH search recall vs exact cosine top-10") {
    val emb = Tables.embeddings(spark, Sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = Knn.topK(corpus, "vec_id", "embedding", q, "qvec", cosineDistance, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = LshAnn.search(corpus, "vec_id", "embedding", q, "qvec",
        dims = 64, k = 10, tables = 8, bits = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
  }
}
