package graft.tools

import graft.Tables
import graft.operators.{IvfIndex, Knn, Materializer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: per-stage wall time of the blocked kNN join at a given
  * sfDir — centroid training, blocked init graph, full join — to
  * locate where scale-up cost concentrates (r10: the sf1.0 entry ran
  * 2× the r9 artifact number on a canary-clean box; the stage split
  * says which phase owns it). */
object KjStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val nlist = math.max(16, math.min(1024, math.ceil(math.sqrt(n.toDouble)).toInt))
    val k = 5; val spill = 3; val kInternal = 3 * k
    println(s"[kjs] n=$n nlist=$nlist")

    val mat = Materializer.local()
    var centroids: org.apache.spark.sql.DataFrame = null
    println(f"[kjs] train    ${timed { centroids = IvfIndex.trainCentroids(emb, "vec_id", "embedding", nlist, iters = 2, mat) }}%.2f s")
    val primary = IvfIndex.rankedCells(emb, "embedding", centroids, 1)
      .select(element_at(col("cells"), 1).as("cell"),
        col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val spilled = IvfIndex.rankedCells(emb, "embedding", centroids, spill)
      .select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
        explode(col("cells")).as("cell"))
    val init = primary.join(spilled, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a").as("src"), col("id_b").as("dst"),
        graft.functions.VectorFunctions.l2Distance(col("v_a"), col("v_b")).as("dist"))
      .groupBy(col("src"))
      .agg(graft.functions.TopKAggregate.topK(col("dist"), col("dst"), kInternal).as("nn"))
      .select(col("src"), explode(col("nn.id")).as("dst"))
    println(f"[kjs] initcnt  ${timed { println("[kjs] init edges = " + init.count()) }}%.2f s")
    var out: org.apache.spark.sql.DataFrame = null
    println(f"[kjs] descent1 ${timed { out = Knn.nnDescentRefine(emb, "vec_id", "embedding", graft.functions.VectorFunctions.l2Distance, kInternal, init, rounds = 1, mat); out.count(); () }}%.2f s")
    mat.releaseAll()
    val mat2 = Materializer.local()
    println(f"[kjs] descent2 ${timed { out = Knn.nnDescentRefine(emb, "vec_id", "embedding", graft.functions.VectorFunctions.l2Distance, kInternal, init, rounds = 2, mat2); out.count(); () }}%.2f s")
    mat2.releaseAll()
    spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
    println(f"[kjs] full     ${timed { graft.SparkEntry.queries("vs_knn_join")(spark, d).write.format("noop").mode("overwrite").save() }}%.2f s")
    spark.stop()
  }
}
