package graft.tools

import org.apache.spark.sql.SparkSession

/** One-serving-entry-per-JVM isolated timing (the RePin discipline
  * for the ServingBench family, which RePin itself cannot reach —
  * serve_* rows are not SparkEntry queries): fresh session, bench
  * configuration (local[32], 32 shuffle partitions), build + warm-up
  * untimed, then a cold and a warm timed probe.
  *
  * Usage: runMain graft.tools.ServeRePin <sfDir> <entry>
  * where <entry> is a ServingBench.all or ServingBench.tput name. */
object ServeRePin {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, s"usage: ServeRePin <sfDir> <entry> (got ${args.mkString(" ")})")
    val sfDir = args(0)
    val entry = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024) // point-read In lists prune row groups (Dedup.eqAnyPred)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    val mk = (graft.streaming.ServingBench.all ++ graft.streaming.ServingBench.tput)
      .collectFirst { case (n, f) if n == entry => f }
      .getOrElse(sys.error(s"unknown serving entry '$entry'"))
    val p = mk(spark, sfDir)
    try {
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // build timed too (r16 — the _build bench rows need isolated
      // re-pins as much as the probes; note RePin-family numbers are
      // COLD, compare cold-to-cold)
      val build = timed(p.build())
      val cold = timed(p.probe())
      val warm = timed(p.probe())
      println(f"[serverepin] $entry build=$build%.3f cold=$cold%.3f warm=$warm%.3f s")
    } finally p.stop()
    spark.stop()
  }
}
