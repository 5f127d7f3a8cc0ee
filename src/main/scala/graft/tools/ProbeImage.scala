package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Throwaway r11 probe: hash-repartition vs range-repartition for the
  * image decode path at sf1.0. */
object ProbeImage {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: SparkSession = spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def t(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime(); f
        println(f"[probe] $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def specsRaw = graft.Tables.documents(spark, d).select(
      col("doc_id"),
      (lit(16) + length(col("text")) % 48).cast("int").as("width"),
      (lit(8) + length(col("text")) % 24).cast("int").as("height"),
      (((hash64(col("text")) % 128) + 128) % 128).cast("int").as("base"))
    def dec(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Multimodal.decodeImages(
        graft.pipeline.Multimodal.synthesizeImages(
          df.as[graft.pipeline.Multimodal.ImageSpec])).toDF()
    t("range32_nosort") { dec(specsRaw.repartitionByRange(32, col("doc_id"))).write.mode("overwrite").format("noop").save() }
    t("range32_sortwp") { dec(specsRaw.repartitionByRange(32, col("doc_id"))).sortWithinPartitions(col("doc_id")).write.mode("overwrite").format("noop").save() }
    t("hash32_nosort") { dec(specsRaw.repartition(32, col("doc_id"))).write.mode("overwrite").format("noop").save() }
    t("range_nosort") { dec(specsRaw.repartitionByRange(col("doc_id"))).write.mode("overwrite").format("noop").save() }
    t("range_sortwp") { dec(specsRaw.repartitionByRange(col("doc_id"))).sortWithinPartitions(col("doc_id")).write.mode("overwrite").format("noop").save() }
    t("partcounts") {
      println("  hash parts=" + specsRaw.repartition(32, col("doc_id")).rdd.getNumPartitions
        + " range parts=" + specsRaw.repartitionByRange(col("doc_id")).rdd.getNumPartitions)
      val sizes = dec(specsRaw.repartitionByRange(col("doc_id")))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      println("  range partition sizes: " + sizes.mkString(","))
    }
    spark.stop()
  }
}
