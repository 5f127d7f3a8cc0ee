package graft.tools

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: IVF-blocked embedding-dedup pair recall across
  * (nlist, spill) and true-pair cosine strata — picks the shipped
  * dedup_embedding_ivf operating point and its RecallGateSpec floor.
  * The isotropic-corpus caveat from RecallGateSpec applies: recall on
  * weak pairs (cos barely over tau) is a property of corpus geometry;
  * genuinely-near pairs should block together at any sane setting. */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val tau = 0.35
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir).cache()
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= tau)
      .select("id_a", "id_b", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    println(s"exact pairs at tau=$tau: ${exact.size}; " +
      s"cos deciles: ${exact.values.toSeq.sorted.grouped(math.max(exact.size / 10, 1)).map(_.head).map(c => f"$c%.2f").mkString(" ")}")

    for (nlist <- Seq(8, 16, 32); spill <- Seq(2, 3)) {
      val got = Dedup.embeddingNearDupIvf(emb, "vec_id", "embedding",
          VectorFunctions.cosineSimilarity, tau, nlist, spill)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = exact.keySet & got
      def rec(lo: Double, hi: Double): String = {
        val denom = exact.count { case (_, c) => c >= lo && c < hi }
        val num = hit.count { p => val c = exact(p); c >= lo && c < hi }
        if (denom == 0) "n/a" else f"${num.toDouble / denom}%.2f($denom)"
      }
      println(f"nlist=$nlist%2d spill=$spill: overall ${hit.size.toDouble / exact.size}%.3f " +
        s"| [0.35,0.45) ${rec(0.35, 0.45)} [0.45,0.55) ${rec(0.45, 0.55)} " +
        s"[0.55,0.7) ${rec(0.55, 0.7)} [0.7,1] ${rec(0.7, 1.01)}")
    }
    spark.stop()
  }
}
