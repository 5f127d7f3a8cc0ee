package graft.tools

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment (VERDICT r5 #7): the spill-3 operating point vs the
  * shipped spill-2 — recall@10 over 20 queries AND warm probe latency
  * on the persisted cell-partitioned store, same nlist/nprobe. The
  * r5 #7 "done" bar: spill-3 recall ≥ 0.85 with probe latency within
  * 1.2× of spill 2. */
object ProfileSpill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir).cache()
    val nQ = 20; val k = 10
    val nlist = graft.queries.VectorQueries.IvfNlist
    val nprobe = graft.queries.VectorQueries.IvfNprobe
    val queries = (0 until nQ).map { q =>
      emb.filter(col("vec_id") === q)
        .select(col("embedding").as("qvec"))
    }

    // brute-force truth per query
    val truth = (0 until nQ).map { q =>
      graft.operators.Knn.topK(
        emb.filter(col("vec_id") =!= q), "vec_id", "embedding",
        queries(q), "qvec", l2Distance, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }

    for (spill <- Seq(2, 3)) {
      val (indexed, centroids) = IvfIndex.buildIndex(
        emb, "vec_id", "embedding", nlist = nlist, spill = spill)
      val dir = java.nio.file.Files.createTempDirectory(s"spill$spill").toString
      IvfIndex.writePartitioned(indexed, s"$dir/store")
      val store = spark.read.parquet(s"$dir/store")
      val cents = graft.operators.Materializer.local().mat(centroids, s"c$spill")
      def probeAll(): Double = {
        var hits = 0
        for (q <- 0 until nQ) {
          val got = IvfIndex.search(store.filter(col("vec_id") =!= q),
            "vec_id", "embedding", cents, queries(q), "qvec",
            l2Distance, k, nprobe)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          hits += (got & truth(q)).size
        }
        hits.toDouble / (nQ * k)
      }
      probeAll() // warmup (plans, codegen, page cache)
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); probeAll(); (System.nanoTime() - t0) / 1e9
      }
      val recall = probeAll()
      println(f"spill=$spill recall@10=$recall%.3f warm-probe x$nQ: " +
        f"median=${times.sorted.apply(1)}%.2fs (${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
