package graft.tools

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev experiment: IVF recall@10 across (spill, nprobe) operating
  * points on the isotropic sf0.01 corpus — picks the shipped
  * configuration for the ≥0.7 recall floor (VERDICT r4 #3). */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir).cache()
    val nQueries = 20
    val k = 10
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).cache()

    // ground truth: brute-force top-k per query (excluding self)
    val wq = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    val truth = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        l2Distance(col("embedding"), col("qvec")).as("dist"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= k)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    for (nlist <- Seq(16, 32)) {
      val centroids = graft.operators.Materializer.local().mat(
        IvfIndex.trainCentroids(
          emb.sample(withReplacement = false, 0.25, seed = 42),
          "vec_id", "embedding", nlist, 2), s"cent$nlist")
      for (spill <- Seq(1, 2, 3)) {
        // the shipped kernel assignment (r6): no join, no window
        val indexed = IvfIndex.assignCells(emb, "embedding", centroids, spill)
          .select(col("vec_id"), col("embedding"), col("centroid_id")).cache()
        indexed.count()
        for (nprobe <- Seq(2, 4, 6, 8)) {
          val wc = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("centroid_id"))
          val probes = queries.crossJoin(broadcast(centroids))
            .select(col("qid"), col("qvec"), col("centroid_id"),
              l2Distance(col("qvec"), col("centroid")).as("cdist"))
            .withColumn("rn", row_number().over(wc)).filter(col("rn") <= nprobe)
            .select(col("qid"), col("qvec"), col("centroid_id"))
          val wk = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
          val got = indexed.join(broadcast(probes), Seq("centroid_id"))
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              l2Distance(col("embedding"), col("qvec")).as("dist"))
            .dropDuplicates("qid", "vec_id")
            .withColumn("rn", row_number().over(wk)).filter(col("rn") <= k)
            .select(col("qid"), col("vec_id")).as[(Long, Long)].collect()
            .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
          val recalls = truth.keys.toSeq.sorted.map { q =>
            val g = got.getOrElse(q, Set.empty)
            truth(q).intersect(g).size.toDouble / k
          }
          val mean = recalls.sum / recalls.size
          println(f"[recall] nlist=$nlist%2d spill=$spill nprobe=$nprobe%2d  mean recall@$k = $mean%.3f  (min ${recalls.min}%.2f)  candFrac=${spill.toDouble * nprobe / nlist}%.3f")
        }
        indexed.unpersist()
      }
    }
    spark.stop()
  }
}
