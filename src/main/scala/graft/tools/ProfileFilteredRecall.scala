package graft.tools

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{IvfIndex, Knn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: filtered-probe recall vs nprobe on the spilled
  * store — sizes the filtered-query probe widening factor
  * (pgvector iterative-scan analogue). */
object ProfileFilteredRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir).cache()
    val (indexed0, centroids) = IvfIndex.buildIndex(
      emb, "vec_id", "embedding", nlist = 32, spill = 2)
    val indexed = indexed0.cache(); indexed.count()
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))

    for (lbl <- Seq(3, 5)) {
      val exact = Knn.topK(
        emb.filter(col("vec_id") =!= 0 && col("label") === lbl),
        "vec_id", "embedding", query, "qvec", l2Distance, 10)
        .collect().map(_.getLong(0)).toSet
      for (nprobe <- Seq(6, 9, 12, 18, 24, 32)) {
        val got = IvfIndex.search(
          indexed.filter(col("vec_id") =!= 0 && col("label") === lbl),
          "vec_id", "embedding", centroids, query, "qvec", l2Distance,
          k = 10, nprobe = nprobe)
          .collect().map(_.getLong(0)).toSet
        println(f"[frecall] label=$lbl nprobe=$nprobe%2d recall@10=${(got & exact).size / 10.0}%.2f")
      }
    }
    spark.stop()
  }
}
