package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the PER-ROUND physical plans of the two driver-iterated
  * loops (dedup_clusters' label propagation, graph_pagerank's score
  * round). The declared queries' own explain output shows only the
  * final checkpointed frame, so round-shape claims (which side
  * exchanges per round) need this instrument. Prints the formatted
  * plan of round 1 with materialized (checkpointed) inputs — exactly
  * what each later round executes.
  * Usage: runMain graft.tools.IterPlanDump <sfDir> [cc|pr] */
object IterPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("cc")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    if (which == "cc") {
      // the connectedComponents round body over checkpointed inputs,
      // reproduced verbatim (operators/Dedup.scala)
      val docs = graft.Tables.documents(spark, sfDir)
      val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, tau = 0.8, maxBucket = 50)
      val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
      def roundPlan(partitionEdges: Boolean): String = {
        val e0 = p.select(col("doc_a").as("a"), col("doc_b").as("b"))
          .unionAll(p.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .distinct()
        val edges = (if (partitionEdges) e0.repartition(col("b")) else e0)
          .localCheckpoint()
        val labels = edges.select(col("a").as("node")).distinct()
          .select(col("node"), col("node").as("label")).localCheckpoint()
        val neighborMin = edges
          .join(labels, edges("b") === labels("node"))
          .groupBy(col("a")).agg(min(col("label")).as("nmin"))
        val propagated = labels
          .join(neighborMin, labels("node") === neighborMin("a"), "left_outer")
          .select(col("node"), col("label"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("plabel"))
        fmt(propagated)
      }
      println("===== cc round body BEFORE (edges materialized as distinct() left them)")
      println(roundPlan(partitionEdges = false))
      println("===== cc round body AFTER (edges pre-partitioned on b — r18)")
      println(roundPlan(partitionEdges = true))
    } else {
      val lineitem = graft.Tables.lineitem(spark, sfDir)
      val edges = lineitem.select((col("l_orderkey") % 1000).as("src"),
        (col("l_partkey") % 1000).as("dst"))
      val e = edges.localCheckpoint()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val edgeDeg = e.join(deg, "src")
        .select(col("src"), col("dst"), col("deg"))
        .repartition(col("src")).localCheckpoint()
      val scores = edgeDeg.select(col("src").as("node")).distinct()
        .select(col("node"), lit(graft.operators.PageRank.Scale).as("score"))
        .localCheckpoint()
      val next = edgeDeg.join(scores.hint("shuffle_hash"),
          edgeDeg("src") === scores("node"))
        .select(col("dst"), expr("(score * 85 div 100) div deg").as("c"))
        .groupBy(col("dst"))
        .agg((sum(col("c")) + lit(15L * graft.operators.PageRank.Scale / 100L)).as("score"))
        .select(col("dst").as("node"), col("score"))
      println("===== pagerank round body")
      println(fmt(next))
    }
    spark.stop()
  }
}
