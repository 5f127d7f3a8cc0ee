package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: training-accuracy of curate_classifier per scale
  * factor (the operating point lr=2.0 / 16 epochs was picked here:
  * presence features reach 0.93 at sf0.001; L1-normalized counts
  * stall at the 0.56 majority baseline for any feasible lr because
  * per-feature magnitude ~1/250 keeps margins under float noise). */
object ProfileClassifier {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args.toSeq match {
      case Nil => Seq("sf0.001", "sf0.01"); case a => a }) {
      val df = graft.SparkEntry.queries("curate_classifier")(
        spark, s"/root/testdata/$sf")
      val agg = df.agg(
        avg((col("pred") === col("y").cast("int")).cast("double")).as("acc"),
        count(lit(1)).as("n")).head
      println(s"[cls] $sf acc=${agg.getDouble(0)} n=${agg.getLong(1)}")
    }
    spark.stop()
  }
}
