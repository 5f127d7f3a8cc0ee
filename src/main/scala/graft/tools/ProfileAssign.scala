package graft.tools

import graft.functions.VectorFunctions._
import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev experiment (VERDICT r5 #1 follow-through): wall-clock of the
  * shuffle-free ranked-cells assignment vs the old crossJoin +
  * per-id-window argmin, at a size where the exchange actually
  * matters (200k synthetic vectors × 64 dims, nlist 128 — the old
  * path exchanges 25.6M rows; sf0.1's 2k vectors hide everything
  * under the job floor). */
object ProfileAssign {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 200000; val dims = 64; val nlist = 128
    val corpus = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => sin(col("id") * 7919 + i * 104729)).as("embedding"))
      .localCheckpoint()
    val centroids = graft.operators.Materializer.local().mat(
      IvfIndex.trainCentroids(
        corpus.sample(withReplacement = false, 0.05, seed = 1),
        "vec_id", "embedding", nlist, iters = 1),
      "cent")

    // sum(centroid_id) forces the assignment to actually evaluate —
    // count() would let ColumnPruning delete the whole computation
    def timed(tag: String)(thunk: => (Long, Long)): Unit = {
      thunk // warm
      val t0 = System.nanoTime(); val (rows, sum) = thunk
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($rows rows, checksum $sum)")
    }
    def force(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("centroid_id"))).head
      (r.getLong(0), r.getLong(1))
    }

    timed("old crossJoin+window") {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cdist"), col("centroid_id"))
      force(corpus.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("centroid_id"),
          l2Distance(col("embedding"), col("centroid")).as("cdist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("centroid_id")))
    }
    timed("new kernel (spill 1)") {
      force(IvfIndex.assign(corpus, "vec_id", "embedding", centroids))
    }
    timed("new kernel (spill 2)") {
      force(IvfIndex.assignCells(corpus, "embedding", centroids, spill = 2))
    }
    spark.stop()
  }
}
