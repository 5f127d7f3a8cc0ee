package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dir, names) =
      if (args.nonEmpty && args(0).startsWith("/")) (args(0), args.drop(1))
      else ("/root/testdata/sf0.1", args)
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime()
      // Bench's contention canary, printed per entry so TimeOne
      // numbers can be placed in the same canary band as the
      // committed artifacts
      spark.range(4000000L).selectExpr("sum(id) s").collect()
      val c = (System.nanoTime() - t1) / 1e9
      println(f"[time] $n ${(t1 - t0)/1e9}%.2f s (canary $c%.3f)")
    }
    spark.stop()
  }
}
