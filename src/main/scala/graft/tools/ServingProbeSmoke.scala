package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke runner for the ServingBench probes (VERDICT r9 #7): build +
  * warm-up + one timed probe per serving surface at a small SF, so the
  * bench entries can be validated without a full Bench run. */
object ServingProbeSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.ServingBench.all.foreach { case (name, mk) =>
      val p = mk(spark, sfDir)
      try {
        val t0 = System.nanoTime(); p.build()
        val tB = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); p.probe()
        val tP = (System.nanoTime() - t1) / 1e9
        println(f"$name%-20s build=$tB%.2fs probe=$tP%.3fs")
      } finally p.stop()
    }
    spark.stop()
  }
}
