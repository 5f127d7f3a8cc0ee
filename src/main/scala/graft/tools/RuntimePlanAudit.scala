package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only RUNTIME plan capture (VERDICT r8 #7): run the named
  * entries with AQE ON at the given sfDir, force full execution, and
  * print the POST-EXECUTION plan (AQE's final re-planned tree) — the
  * evidence that the fact-fact join strategies hold when runtime
  * stats differ at 10×, which the static sf0.01 audit can't show.
  *
  * Usage: runMain graft.tools.RuntimePlanAudit <sfDir> [names...]
  * (default: the five fact-fact shuffled-hash sites from VERDICT r8.)
  */
object RuntimePlanAudit {
  private val DefaultTargets = Seq(
    "q21_sole_late", "graph_triangles", "vs_knn_join", "q7_volume", "q9_profit")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1.0")
    val targets = if (args.length > 1) args.drop(1).toSeq else DefaultTargets
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    targets.foreach { name =>
      val df = SparkEntry.all(name).fn(spark, sfDir)
      val t0 = System.nanoTime()
      // Execute THIS df's QueryExecution (ADVICE r9): a noop write runs
      // through its own QueryExecution, leaving df's AdaptiveSparkPlan
      // un-executed (isFinalPlan=false) — the printed tree would be the
      // initial AQE plan, not the one that ran. Driving the plan's own
      // RDD forces AQE's re-planning on the same object we print.
      df.queryExecution.executedPlan.execute().foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      require(!plan.contains("isFinalPlan=false"),
        s"$name: AQE tree still initial after execution — audit evidence invalid")
      println(f"\n===== $name (ran in $sec%.1f s, AQE final plan)")
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan parquet") || l.contains("AQEShuffleRead") ||
          l.contains("skewed"))
        .take(40)
        .foreach(l => println("  " + l.trim.take(170)))
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
