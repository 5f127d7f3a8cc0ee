package graft.tools

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only wall-clock probe for dedup_embedding_ivf in isolation —
  * the bench harness runs the full inventory, too coarse when
  * iterating on one entry's scaling (r7: the clone-collapse fix,
  * measured 40.8× sf1.0/sf0.1 before, expected ~linear after). */
object ProfileIvfDedupTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()

    for (round <- 1 to 2) {
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = Dedup.embeddingNearDupIvf(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        VectorFunctions.cosineSimilarity, tau = 0.35,
        nlist = 16, spill = 3, maxBlock = 5000)
        .agg(count(lit(1)), sum(col("vecs_a"))).collect()
      println(f"[ivf-dedup] run$round ${(System.nanoTime() - t0) / 1e9}%7.2f s  out=${n.head.getLong(0)}")
    }
    spark.stop()
  }
}
