package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage profile of dedup_spans / decontam_ngram at sf0.1. */
object ProfileSpans {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    // PDF crypto micro-bench (driver-side, no Spark)
    locally {
      import graft.pipeline.Pdf
      val pages = Seq("word " * 60, "word " * 60)
      val plain = Pdf.write(pages)
      val rc4d = Pdf.writeEncrypted(pages)
      val aesd = Pdf.writeEncrypted(pages, aes = true)
      def loop(doc: Array[Byte]): Unit = { var i = 0; while (i < 2000) { Pdf.extractPages(doc); i += 1 } }
      loop(plain); loop(rc4d) // warm JIT
      time("pdf parse x2000 plain")(loop(plain))
      time("pdf parse x2000 rc4")(loop(rc4d))
      time("pdf parse x2000 aes")(loop(aesd))
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())

    time("funnel cold")(
      graft.SparkEntry.queries("curate_funnel")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    time("funnel warm")(
      graft.SparkEntry.queries("curate_funnel")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    // stage probe: flags only, no window/agg
    locally {
      val maxCount = (xs: org.apache.spark.sql.Column) =>
        graft.functions.ArrayMaxCount.maxCount(xs)
      val flagged = docs
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          coalesce(col("lang") === "en", lit(false)).as("f1"),
          size(col("toks")).cast("long").as("n_toks"),
          size(org.apache.spark.sql.functions.filter(col("toks"),
            t => t.isin(graft.functions.TextFunctions.langDicts.head._2: _*)))
            .cast("long").as("n_stop"),
          maxCount(col("toks")).cast("long").as("max_tok"),
          graft.operators.Dedup.contentKey(col("text")).as("h"))
      time("funnel flags only")(flagged.write.format("noop").mode("overwrite").save())
    }

    time("H fixed decontam")(
      graft.operators.Decontaminate.overlaps(
        docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", 5)
        .write.format("noop").mode("overwrite").save())

    time("G sharedSpans fixed")(
      graft.operators.Dedup.sharedSpans(docs, "doc_id", "text", 15)
        .write.format("noop").mode("overwrite").save())

    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def distinctShingles(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), array_distinct(shingles(col("tk"), 5)).as("sh"))
    val benchSet = distinctShingles(bench)
      .select(explode(col("sh")).as("s"))
      .select(hash64(col("s")).as("h"))
      .distinct()
    time("H1 benchSet.count")(benchSet.count())
    val grams = distinctShingles(corpus)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), hash64(col("s")).as("h"))
    time("H2 grams.count")(grams.count())
    time("H3 join+agg")(
      grams.join(broadcast(benchSet.withColumn("hit", lit(1L))), Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .filter(col("n_overlap") > 0)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
