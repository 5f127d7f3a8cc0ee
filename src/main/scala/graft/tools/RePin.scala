package graft.tools

import org.apache.spark.sql.SparkSession

/** One-entry-per-JVM isolated timing for re-pinning weak bench rows
  * (VERDICT r9 #3, the curate_funnel discipline): each invocation
  * times exactly one entry in a fresh JVM/session so no neighbor's
  * blocks, GC debt or codegen cache can contaminate the number.
  *
  * Usage: runMain graft.tools.RePin <sfDir> <entry>
  * where <entry> is a SparkEntry query name or `<name>_build` for a
  * split-bench build phase. Prints one `[repin]` line, cold timing
  * (the Bench-reported number for >3 s entries is also cold). */
object RePin {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, s"usage: RePin <sfDir> <entry> (got ${args.mkString(" ")})")
    val sfDir = args(0)
    val entry = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024) // point-read In lists prune row groups (Dedup.eqAnyPred)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup: JVM, codegen, shuffle machinery (same as Bench)
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // any split-bench entry can be timed per phase: `<name>_build`
    // runs only the build thunk; `<name>_probe` runs build UNTIMED
    // (store prep) then times the probe
    def split(base: String) = graft.Bench.splitBench(base)(spark, sfDir)
    val sec = entry match {
      case b if b.endsWith("_build") &&
          graft.Bench.splitBench.contains(b.stripSuffix("_build")) =>
        val (build, _) = split(b.stripSuffix("_build"))
        timed(build())
      case p if p.endsWith("_probe") &&
          graft.Bench.splitBench.contains(p.stripSuffix("_probe")) =>
        val (build, probe) = split(p.stripSuffix("_probe"))
        build()
        timed { probe().write.mode("overwrite").format("noop").save() }
      case name =>
        timed {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
        }
    }
    println(f"[repin] $entry $sec%.2f s")
    spark.stop()
  }
}
