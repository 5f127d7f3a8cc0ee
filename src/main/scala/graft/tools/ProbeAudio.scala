package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Throwaway r11 probe: bisect the mm_audio wall-time — spec derive,
  * repartition, synthesize+decode, checkpoint, orderBy. */
object ProbeAudio {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
      (lit(1000) + length(col("text")) % 3000).cast("int").as("n_samples"),
      (((hash64(col("text")) % 1000) + 1000) % 1000).cast("int").as("base"))
    def decoded = graft.pipeline.Multimodal.decodeWavs(
      graft.pipeline.Multimodal.synthesizeWavs(
        specsRaw.repartition(32, col("doc_id")).as[graft.pipeline.Multimodal.AudioSpec])).toDF()
    t("decode_only") { decoded.write.mode("overwrite").format("noop").save() }
    t("decode_ckpt") { decoded.localCheckpoint(true).write.mode("overwrite").format("noop").save() }
    t("decode_ckpt_order") { decoded.localCheckpoint(true).orderBy(col("doc_id")).write.mode("overwrite").format("noop").save() }
    t("full_query") {
      graft.SparkEntry.queries("mm_audio_decode")(spark, d)
        .write.mode("overwrite").format("noop").save()
    }
    t("synth_only") {
      graft.pipeline.Multimodal.synthesizeWavs(
        specsRaw.repartition(32, col("doc_id")).as[graft.pipeline.Multimodal.AudioSpec])
        .toDF().selectExpr("doc_id", "length(bytes) bl")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
