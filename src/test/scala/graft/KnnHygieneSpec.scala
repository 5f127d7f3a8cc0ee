package graft

import graft.functions.VectorFunctions
import graft.operators.{Knn, Materializer}
import org.apache.spark.sql.functions._

/** Block hygiene of the kNN-graph construction (VERDICT r8 #2): the
  * managed scope releases every pinned block, and the explicit-mat
  * path strands exactly one mat-owned block (the final graph) that
  * releaseAll() frees. */
class KnnHygieneSpec extends SparkSpec {

  private def graftBlocks(): Int =
    spark.sparkContext.getPersistentRDDs.size

  test("knnJoinManaged leaves no persistent RDDs after the action completes") {
    // other suites share the session — settle to a clean baseline
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    assert(graftBlocks() == 0)
    val rows = Knn.knnJoinManaged(
      Tables.embeddings(spark, Sf).filter(col("vec_id") < 200),
      "vec_id", "embedding", VectorFunctions.l2Distance,
      k = 3, nlist = 8, spill = 2) { df => df.count() }
    assert(rows > 0)
    assert(graftBlocks() == 0,
      s"knnJoinManaged stranded ${graftBlocks()} persistent RDDs")
  }

  test("explicit-mat knnJoin pins only mat-owned blocks; releaseAll frees them") {
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    val mat = Materializer.local()
    val df = Knn.knnJoin(
      Tables.embeddings(spark, Sf).filter(col("vec_id") < 200),
      "vec_id", "embedding", VectorFunctions.l2Distance,
      k = 3, nlist = 8, spill = 2, mat = mat)
    val n1 = df.count()
    // the materialized final graph means a second action re-reads the
    // block instead of re-running the descent join
    assert(df.count() == n1)
    assert(graftBlocks() >= 1, "final graph should be materialized")
    mat.releaseAll()
    assert(graftBlocks() == 0,
      s"releaseAll left ${graftBlocks()} persistent RDDs pinned")
  }
}
