package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only isolated profile for curate_funnel (VERDICT r7 "next"
  * #6): three clean runs in a fresh JVM under the Bench session
  * config, separating the cold pass (codegen + footer listing) from
  * warm re-runs, to pin whether the r7 driver number (3.81 s) was a
  * real regression or the documented warm-threshold flip. */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("curate_funnel")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[funnel] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
