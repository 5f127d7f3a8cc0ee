package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only fixed-batch scale probe for incremental dedup (VERDICT
  * r13 #2): times ONE per-batch probe of a FIXED 500-document batch
  * (doc_id < 5000 ∧ doc_id % 10 = 0 — copy 0 of every replicated
  * fixture, so the batch is byte-identical at sf0.1 / sf1.0 / sf10)
  * against the persisted corpus stores of the given sfDir. The store
  * build (ensureIncStore) is untimed — the index-once half. Cold and
  * warm probe times print; the scale claim is the WARM fixed-batch
  * number being ~flat as the corpus grows 10× (the residual this
  * measures was 2.08 → 3.81 s in r13).
  *
  * Usage: runMain graft.tools.ProfileIncDedup <sfDir> [--no-bloom]
  */
object ProfileIncDedup {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileIncDedup <sfDir> [--no-bloom]")
    val sfDir = args(0)
    val useBloom = !args.contains("--no-bloom")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024) // point-read In lists prune row groups (Dedup.eqAnyPred)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val p = graft.queries.DedupQueries.ensureIncStore(spark, sfDir)
    val bloom =
      if (useBloom) Some(graft.queries.DedupQueries.loadIncBloom(p)) else None
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 5000 && col("doc_id") % 10 === 0)
      .localCheckpoint() // fixed input: exclude the docs scan from the timing
    def probe(): Long =
      Dedup.incrementalMinhash(batch, "doc_id", "text",
        spark.read.parquet(s"$p/bands"), spark.read.parquet(s"$p/sh"),
        shingleN = 3, numHashes = 32, bands = 8, tau = 0.8,
        bandBloom = bloom).count()
    var rows = 0L
    val cold = timed { rows = probe() }
    val warm = timed { probe(); () }
    val warm2 = timed { probe(); () }
    println(f"[incdedup] sf=$sfDir bloom=$useBloom rows=$rows " +
      f"cold=$cold%.2f warm=$warm%.2f warm2=$warm2%.2f s")
    spark.stop()
  }
}
