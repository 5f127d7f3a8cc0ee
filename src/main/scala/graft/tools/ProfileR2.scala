package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only: isolate the two round-1 bench anomalies (q_rollup 9.3s,
  * dedup_minhash_lsh 13.9s) at the driver's exact harness shape —
  * local[32], 32 shuffle partitions, noop sink — each query twice to
  * split cold (codegen/JIT) cost from steady-state. */
object ProfileR2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_rollup", "dedup_minhash_lsh", "dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()

    for (name <- names; round <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-24s run$round ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
