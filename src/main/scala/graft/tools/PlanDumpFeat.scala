package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the classifier feature-frame physical plan (the
  * r17 plans/ evidence for the clsFeat single-materialization change —
  * before: the trigram aggregate subtree appears once per union
  * branch; after: the second branch reads the persisted aggregate). */
object PlanDumpFeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (feat, free, _) = graft.queries.CurationQueries.clsFeat(spark, sfDir)
    println(feat.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    free()
    spark.stop()
  }
}
