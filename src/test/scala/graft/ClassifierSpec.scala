package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Logistic-regression operator invariants on constructed data —
  * separable data converges to separating weights, the bias bucket
  * carries class imbalance, scoring is the σ(w·x) contract. */
class ClassifierSpec extends SparkSpec {

  test("separable features converge to a separating model") {
    import spark.implicits._
    // docs 0..19: even docs carry bucket 0 (label 1), odd carry bucket 1
    val feat = (0L until 20L).flatMap { d =>
      Seq((d, if (d % 2 == 0) 0 else 1, 1.0), (d, 2, 1.0)) // + shared bias
    }.toDF("doc_id", "b", "x")
    val labels = (0L until 20L).map(d => (d, if (d % 2 == 0) 1.0 else 0.0))
      .toDF("doc_id", "y")
    val w = Classifier.trainLogReg(spark, feat, labels,
      buckets = 3, epochs = 30, lr = 2.0)
    assert(w(0) > 0, s"positive-class bucket weight must be positive: ${w.toSeq}")
    assert(w(1) < 0, s"negative-class bucket weight must be negative: ${w.toSeq}")
    val scores = Classifier.score(spark, feat, w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 20L).foreach { d =>
      val p = scores(d)
      if (d % 2 == 0) assert(p > 0.5, s"doc $d: $p") else assert(p < 0.5, s"doc $d: $p")
    }
  }

  test("bias-only features learn the class prior's sign") {
    import spark.implicits._
    // 15 positive / 5 negative, all with ONLY the bias feature: the
    // model can do no better than the prior, whose logit is positive
    val feat = (0L until 20L).map(d => (d, 0, 1.0)).toDF("doc_id", "b", "x")
    val labels = (0L until 20L).map(d => (d, if (d < 15) 1.0 else 0.0))
      .toDF("doc_id", "y")
    val w = Classifier.trainLogReg(spark, feat, labels,
      buckets = 1, epochs = 40, lr = 2.0)
    assert(w(0) > 0, s"prior 0.75 must give a positive bias, got ${w(0)}")
    val p = Classifier.score(spark, feat, w).select(min(col("score"))).head.getDouble(0)
    assert(p > 0.5 && p < 1.0)
  }

  test("trained weights are bit-identical across partition counts") {
    import spark.implicits._
    // realistic shape: many docs, overlapping buckets, fractional
    // weights after the NB warm start — the case where a float-sum
    // gradient reduce WOULD reassociate differently per partitioning
    val feat = (0L until 400L).flatMap { d =>
      (0 until 12).map(j => (d, ((d * 7 + j * j) % 50).toInt, 1.0 + (j % 3))) ++
        Seq((d, 50, 1.0)) // bias
    }.toDF("doc_id", "b", "x")
    val labels = (0L until 400L).map(d => (d, if ((d * 13) % 3 == 0) 1.0 else 0.0))
      .toDF("doc_id", "y")
    val ws = Seq(1, 3, 13).map { parts =>
      val f = feat.repartition(parts)
      val w0 = Classifier.nbLogOdds(spark, f, labels, buckets = 51, biasBucket = 50)
      Classifier.trainLogReg(spark, f, labels,
        buckets = 51, epochs = 4, lr = 0.05, init = w0).toSeq
    }
    assert(ws(0) == ws(1) && ws(1) == ws(2),
      "weights diverged across partition counts — the gradient reduce reassociated")
  }

  test("empty training set is rejected") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, Double)].toDF("doc_id", "b", "x")
    val noLabels = Seq.empty[(Long, Double)].toDF("doc_id", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(spark, empty, noLabels, buckets = 1, epochs = 1, lr = 1.0)
    }
  }
}
