package graft.tools

import graft.pipeline.{Ingest, PdfIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: localize the 4× gap between ingest_pdf_pages_probe
  * (~3 s) and ingest_pdf_store (~12.6 s) at sf0.1 — same blobs, same
  * parse, so the delta must be in toVectorStore / the final sort. */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()

    val blobs = graft.queries.PipelineQueries.rebuildPdfBlobs(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime(); noop(mk)
      val c = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); noop(mk)
      val w = (System.nanoTime() - t1) / 1e9
      println(f"[profile] $name%-28s cold=$c%6.2f warm=$w%6.2f")
    }

    def pg = PdfIngest.pages(spark.read.parquet(blobs), carry = Seq("doc_id", "source"))
    def store = Ingest.toVectorStore(pg, "doc_id", "page_text", "source",
      pageCol = Some("page_number"), maxLen = 300, lookback = 30)

    t("pages") { pg }
    t("pages_sorted") { pg.orderBy(col("doc_id"), col("page_number")) }
    t("store_nosort_noemb") {
      store.select(col("id"), col("origntext"), col("filename"),
        col("pagenumber"), col("chunk_idx"), col("status"))
    }
    t("store_sorted_noemb") {
      store.select(col("id"), col("origntext"), col("filename"),
        col("pagenumber"), col("chunk_idx"), col("status")).orderBy(col("id"))
    }
    t("store_full") { store }

    println("=== explain store_sorted_noemb ===")
    store.select(col("id"), col("origntext"), col("filename"),
      col("pagenumber"), col("chunk_idx"), col("status")).orderBy(col("id"))
      .explain("formatted")
    spark.stop()
  }
}
