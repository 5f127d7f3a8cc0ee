package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: re-cluster an existing (part_id, graph) store through
  * [[graft.operators.Hnsw.writeGraphsClustered]] — used to A/B the
  * row-group sizing fix on already-built stores without re-paying the
  * graph build. Usage: runMain graft.tools.RewriteClustered <src> <dst> */
object RewriteClustered {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Hnsw.writeGraphsClustered(
      spark.read.parquet(args(0)), args(1))
    spark.stop()
  }
}
