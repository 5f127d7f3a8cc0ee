package graft.tools

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness: mean recall@k of the blocked kNN join vs the exact
  * all-pairs ranking, per scale factor. */
object ProfileKnnJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val approx = graft.SparkEntry.queries("vs_knn_join")(spark, d)
        .select(col("vec_id"), col("neighbor_id"))
      val a = emb.select(col("vec_id").as("qa"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("qb"), col("embedding").as("vb"))
      val w = Window.partitionBy(col("qa")).orderBy(col("dist"), col("qb"))
      val exact = a.join(b, col("qa") =!= col("qb"))
        .select(col("qa"), col("qb"), l2Distance(col("va"), col("vb")).as("dist"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("qa").as("vec_id"), col("qb").as("neighbor_id"))
      val hit = approx.intersect(exact).count().toDouble
      val total = exact.count().toDouble
      println(s"[kj] $sf recall@5 = ${hit / total} ($hit/$total)")
    }
    spark.stop()
  }
}
