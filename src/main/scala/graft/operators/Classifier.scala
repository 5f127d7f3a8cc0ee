package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training over hashed n-gram
  * features — the fastText-shaped quality/domain classifier a
  * training-data pipeline fits on a labeled slice and sweeps over the
  * corpus (CCNet's LM-filter sibling; GPT-3/LLaMA used exactly this
  * family to score web text against a curated target).
  *
  * Architecture: the weight vector lives on the DRIVER (one double
  * per hashed bucket — bounded by the feature-space size, never the
  * corpus) and is broadcast each epoch; the gradient is computed by
  * the executors as ONE map-side-combined aggregation over the
  * (doc, bucket, x) projection per epoch. Nothing corpus-sized ever
  * reaches the driver: the per-epoch collect is exactly `buckets`
  * rows. At 100 TB the feature projection is the dominant cost, so
  * callers materialize it once ([[Materializer]]) and every epoch
  * re-reads the compact projection instead of re-tokenizing.
  *
  * Determinism: gradients sum doubles across partitions, so trained
  * weights are only reproducible to float-addition reassociation —
  * the classifier is gated on measured accuracy (RecallGateSpec),
  * not on a bit-exact oracle (SURVEY.md §3's approximate tier).
  */
object Classifier {

  /** One training epoch's gradient, as a closed-form DataFrame plan:
    * margin per doc (features ⋈ broadcast weights, map-side-combined
    * sum), residual per doc (σ(margin) − y), gradient per bucket
    * (features ⋈ residuals, map-side-combined sum). */
  private def gradient(spark: SparkSession, feat: DataFrame,
      labels: DataFrame, w: Array[Double]): Array[(Int, Double)] = {
    import spark.implicits._
    val wDf = w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("b", "w")
    val margins = feat.join(broadcast(wDf), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("x") * col("w")).as("m"))
    val resid = margins.join(labels, "doc_id")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
    feat.join(resid, "doc_id")
      .groupBy(col("b"))
      .agg(sum(col("x") * col("r")).as("g"))
      .collect() // exactly `buckets` rows — driver-bounded
      .map(row => (row.getInt(0), row.getDouble(1)))
  }

  /** Batch gradient descent. `feat`: (doc_id: long, b: int, x:
    * double) — one row per (doc, active bucket), L1-normalized
    * counts plus a bias bucket work well. `labels`: (doc_id, y:
    * double in {0,1}). Returns the weight vector (index = bucket).
    *
    * `feat` is consumed `epochs` times — pass a materialized frame. */
  def trainLogReg(spark: SparkSession, feat: DataFrame, labels: DataFrame,
      buckets: Int, epochs: Int, lr: Double, l2: Double = 1e-4): Array[Double] = {
    val n = labels.count().toDouble
    require(n > 0, "empty training set")
    val w = new Array[Double](buckets)
    var e = 0
    while (e < epochs) {
      val grad = gradient(spark, feat, labels, w)
      grad.foreach { case (b, g) =>
        w(b) -= lr * (g / n + l2 * w(b))
      }
      e += 1
    }
    w
  }

  /** Score a feature frame with trained weights: (doc_id, score)
    * where score = σ(w·x) — one broadcast join + map-side-combined
    * sum, linear in the corpus. */
  def score(spark: SparkSession, feat: DataFrame, w: Array[Double]): DataFrame = {
    import spark.implicits._
    val wDf = w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("b", "w")
    feat.join(broadcast(wDf), "b")
      .groupBy(col("doc_id"))
      .agg((lit(1.0) / (lit(1.0) + exp(-sum(col("x") * col("w"))))).as("score"))
  }
}
