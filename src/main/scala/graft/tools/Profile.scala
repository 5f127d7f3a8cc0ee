package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup hot paths. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())

    val sh = Dedup.shingleRows(docs, "doc_id", "text", 4).localCheckpoint()
    time("shingleRows(4) [ckpt]")(sh.count())
    val sh2 = Dedup.shingleRows(docs, "doc_id", "text", 4)
    time("shingleRows(4) recompute")(sh2.count())

    val shared = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
    time("shared-shingle join")(shared.count())

    time("full ngramJaccard")(
      Dedup.ngramJaccard(docs, "doc_id", "text", 4, 0.65).count())

    val sh3 = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh3, 64)
    time("minhashSignatures")(sigs.count())
    val bands = Dedup.lshBands(sigs, 64, 16)
    time("lshBands")(bands.count())
    val cand = Dedup.candidatePairs(bands)
    time("candidatePairs")(cand.count())
    time("full minhashLsh")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.8).count())

    spark.stop()
  }
}
