package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: prints the formatted physical plan of each
  * inventory query and flags scale smells (missing pushdown, missing
  * broadcast, cartesian products, absent codegen). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // AQE off: its pre-execution formatted plan hides `codegen id`
      // markers (everything would flag no-codegen); the static plan is
      // what this audit grades.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.all.toSeq.sortBy(_._1).foreach { case (name, qd) =>
      if (only.isEmpty || only.contains(name)) {
        val plan = qd.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "no-codegen" -> !plan.contains("codegen id"),
          "sort-merge-join" -> plan.contains("SortMergeJoin"),
          "scan-without-pushdown" ->
            (plan.contains("PushedFilters: []") && plan.contains("Filter")),
        ).collect { case (s, true) => s }
        println(s"\n===== $name ${if (smells.nonEmpty) smells.mkString("[", ",", "]") else "[clean]"}")
        if (args.length > 1 || sys.env.contains("AUDIT_FULL")) println(plan)
        else {
          // summary: scans with pushed filters + exchanges + joins
          plan.linesIterator
            .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
              l.contains("PartitionFilters") ||
              l.contains("Exchange") || l.contains("Join") || l.contains("ReadSchema"))
            .take(24)
            .foreach(l => println("  " + l.trim.take(160)))
        }
      }
    }
    spark.stop()
  }
}
