package graft.tools
import org.apache.spark.sql.SparkSession
object KjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    for (i <- 1 to 3) {
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("vs_knn_join")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
