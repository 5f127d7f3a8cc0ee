package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Dev-only dedup_clusters profile (round 8): pair volume + wall for
  * the raw LSH+CC path vs the clone-collapsed [[Dedup.minhashClusters]]
  * at a replicated scale factor, where clone cliques dominate. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    time("raw pairs count") {
      println("[cc]   pairs = " + Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, tau = 0.8, maxBucket = 50).count())
    }
    time("collapsed clusters") {
      println("[cc]   rows = " + Dedup.minhashClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, tau = 0.8, maxBucket = 50).count())
    }
    spark.stop()
  }
}
