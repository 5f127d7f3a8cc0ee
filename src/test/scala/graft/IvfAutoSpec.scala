package graft

import graft.functions.VectorDistance
import org.apache.spark.sql.functions._

/** IvfProbeRule: the optimizer must rewrite the reference's
  * literal-query knn shape over a registered cell-partitioned store
  * into a partition-pruned probe, leave ineligible plans alone, and
  * keep useful recall. */
class IvfAutoSpec extends SparkSpec {

  private lazy val auto = SparkEntry.queries("vs_ivf_auto")(spark, Sf)

  /** The probe is real only if the scan's PartitionFilters carries the
    * injected IN list (a partitioned scan always PRINTS the field). */
  private def probed(plan: String): Boolean =
    "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN".r.findFirstIn(plan).isDefined

  test("literal-query knn over the registered store is rewritten to a pruned probe") {
    val optimized = auto.queryExecution.optimizedPlan.toString
    assert(optimized.contains("centroid_id"), s"no probe filter in:\n$optimized")
    val physical = auto.queryExecution.executedPlan.toString
    assert(probed(physical),
      s"probe filter did not reach the scan as partition pruning:\n$physical")
    assert(auto.collect().length == 10)
  }

  test("probe results keep useful recall vs exact search on the same store") {
    val approx = auto.collect().map(_.getLong(0)).toSet
    // exact twin: full sort, NO limit node — the rule only fires on
    // the Limit▸Sort shape, so this is guaranteed un-rewritten
    val store = spark.read.parquet(
      auto.queryExecution.optimizedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
        .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.head.toString)
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    // the spilled store carries duplicate rows per vector — the exact
    // twin dedups ids before ranking
    val exact = store.filter(col("vec_id") =!= 0)
      .dropDuplicates("vec_id")
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .collect().take(10).map(_.getLong(0)).toSet
    // r5 operating point (spill 2, nprobe 6/32) measures recall ≈ 0.8
    // on the single gate query; RecallGateSpec holds the 0.7 floor
    assert((approx & exact).size >= 7, s"recall too low: $approx vs $exact")
  }

  test("spill=3 registered store: rule-injected dedup keeps exactly one copy per vector") {
    // exercises probeCondition's static rank conjunction PAST rank 2
    // (j = 2 terms) — the spill-2 auto fixture never hits it
    val dir = java.nio.file.Files.createTempDirectory("ivfauto3").toString
    val (indexed, centroids) = graft.operators.IvfIndex.buildIndex(
      Tables.embeddings(spark, Sf), "vec_id", "embedding", nlist = 8, spill = 3)
    graft.operators.IvfIndex.writePartitioned(indexed, s"$dir/store")
    graft.plans.IvfCatalog.register(s"$dir/store", centroids, nprobe = 4)
    graft.plans.IvfProbeRule.install(spark)
    try {
      val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
      val knn = spark.read.parquet(s"$dir/store")
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(20)
      assert(probed(knn.queryExecution.executedPlan.toString),
        "spill-3 store plan not partition-pruned")
      val got = knn.collect().map(_.getLong(0)).toSeq
      assert(got.distinct == got,
        s"rule dedup leaked duplicate copies from the spill-3 store: $got")
      assert(got.size == 20)
      // full-probe twin (every cell registered = nothing pruned) must
      // equal the exact dedup'd ranking — dedup exactness, not recall
      graft.plans.IvfCatalog.register(s"$dir/store", centroids, nprobe = 8)
      val full = spark.read.parquet(s"$dir/store")
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(20).collect().map(_.getLong(0)).toSeq
      val exact = spark.read.parquet(s"$dir/store")
        .filter(col("vec_id") =!= 0).dropDuplicates("vec_id")
        .select(col("vec_id"),
          VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(20).collect().map(_.getLong(0)).toSeq
      assert(full == exact, s"full-probe spill-3 dedup diverged: $full vs $exact")
    } finally graft.plans.IvfCatalog.invalidate(s"$dir/store")
  }

  test("batch IVF search keeps useful per-query recall vs the exact batch") {
    import org.apache.spark.sql.functions.typedLit
    val batch = SparkEntry.queries("vs_ivf_batch")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(batch.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // exact twin over the same store via the brute-force batch operator
    val store = spark.read.parquet(
      auto.queryExecution.optimizedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
        .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.head.toString)
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // dedup the spilled store's duplicate rows before the exact ranking
    val exact = graft.operators.Knn.topKBatch(
        store.dropDuplicates("vec_id"), "vec_id", "embedding",
        q, "qid", "qvec", graft.functions.VectorFunctions.l2Distance, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = batch.map { case (qid, ids) => (ids & exact(qid)).size.toDouble / 5 }
    assert(recalls.sum / recalls.size >= 0.7, s"avg batch recall too low: $recalls")
  }

  test("cosine and negated-dot literal queries are rewritten with their own metric") {
    import graft.functions.VectorDistance
    val storeP = auto.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
      .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toString
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    def shape(dist: org.apache.spark.sql.Column) =
      spark.read.parquet(storeP).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), dist.as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(10)
    val cos = shape(VectorDistance.cosineDistance(col("embedding"), typedLit(q)))
    assert(probed(cos.queryExecution.executedPlan.toString))
    assert(cos.collect().length == 10)
    val ip = shape(-VectorDistance.dot(col("embedding"), typedLit(q)))
    assert(probed(ip.queryExecution.executedPlan.toString))
    assert(ip.collect().length == 10)
  }

  test("Knn.topK over the registered store (broadcast 1-row query) is rewritten too") {
    val storeP = auto.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
      .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toString
    val qdf = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    // plain DataFrame-API knn — no literal, no index call in sight
    val knn = graft.operators.Knn.topK(
      spark.read.parquet(storeP).filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qdf, "qvec",
      graft.functions.VectorFunctions.l2Distance, 10)
    val phys = knn.queryExecution.executedPlan.toString
    assert(probed(phys), s"join-shape knn was not rewritten:\n$phys")
    // and it returns the same rows as the literal-query probe
    val a = knn.collect().map(_.getLong(0)).toSeq
    val b = auto.collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("multi-row query side keeps the original (un-probed) plan") {
    val storeP = auto.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
      .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toString
    val q2 = Tables.embeddings(spark, Sf).filter(col("vec_id") < 2)
      .select(col("embedding").as("qvec"))
    val knn = graft.operators.Knn.topK(
      spark.read.parquet(storeP).filter(col("vec_id") =!= 1),
      "vec_id", "embedding", q2, "qvec",
      graft.functions.VectorFunctions.l2Distance, 10)
    assert(!probed(knn.queryExecution.executedPlan.toString))
    assert(knn.collect().length == 10)
  }

  test("a sort over a DIFFERENT vector column of the registered store is untouched") {
    val storeP = auto.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
      .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toString
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    // a derived vector column on the SAME registered scan: pruning to
    // cells ranked for `embedding` would be wrong for `neg`
    val derived = spark.read.parquet(storeP)
      .withColumn("neg", transform(col("embedding"), x => -x))
      .select(col("vec_id"), VectorDistance.l2(col("neg"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
    assert(!probed(derived.queryExecution.executedPlan.toString),
      "probe fired on a non-indexed vector column")
    assert(derived.collect().length == 10)
  }

  test("a sort over a JOINED table's same-named embedding column is untouched") {
    val storeP = auto.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
      .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.head.toString
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    // raw (unregistered) embeddings joined to the registered store: the
    // sort key is the RAW table's `embedding`, so pruning the store
    // scan must not happen (it would drop valid top-k rows)
    val raw = Tables.embeddings(spark, Sf)
      .select(col("vec_id").as("rid"), col("embedding"))
    val joined = spark.read.parquet(storeP)
      .select(col("vec_id"), col("centroid_id"))
      .join(raw, col("vec_id") === col("rid"))
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
    assert(!probed(joined.queryExecution.executedPlan.toString),
      "probe fired on a joined table's vector column")
    assert(joined.collect().length == 10)
  }

  test("range filter over the registered store is cell-pruned and stays EXACT") {
    // vs_range_auto on the real store: the IN list is injected (on
    // this isotropic corpus radii are wide, so it may hold all cells)
    // and results must equal the unpruned exact range scan
    val auto = SparkEntry.queries("vs_range_auto")(spark, Sf)
    assert(probed(auto.queryExecution.executedPlan.toString),
      s"range probe not pruned:\n${auto.queryExecution.executedPlan}")
    val got = auto.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    val exact = Tables.embeddings(spark, Sf).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .filter(col("dist") < 1.30)
      .orderBy(col("dist"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact, "triangle-inequality pruning changed range results")
  }

  test("clustered store: range pruning actually skips far cells, results exact") {
    import spark.implicits._
    // 4 tight clusters far apart: cell radii ~0.1, centroid gaps ~10 —
    // a τ=1 query near cluster 0 must scan ONE cell and lose nothing
    val rnd = new scala.util.Random(7)
    val rows = for (c <- 0 until 4; i <- 0 until 50) yield {
      val base = Array.fill(8)(0.0); base(c % 4) = c * 10.0
      val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (c * 100L + i, v.toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("rangeauto").toString
    val emb = rows.toDF("vec_id", "embedding")
    val (indexed, centroids) = graft.operators.IvfIndex.buildIndex(
      emb, "vec_id", "embedding", nlist = 4, trainFraction = 1.0)
    graft.operators.IvfIndex.writePartitioned(indexed, s"$dir/store")
    centroids
      .join(graft.operators.IvfIndex.cellRadii(indexed, "embedding", centroids),
        Seq("centroid_id"), "left")
      .na.fill(0.0, Seq("radius"))
      .write.parquet(s"$dir/centroids")
    graft.plans.IvfCatalog.register(s"$dir/store",
      spark.read.parquet(s"$dir/centroids"), nprobe = 1)
    graft.plans.IvfProbeRule.install(spark)
    val q = rows.head._2.map(_.toDouble).toArray
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .filter(col("dist") < 1.0)
      .orderBy(col("dist"), col("vec_id"))
    val pruned = shape(spark.read.parquet(s"$dir/store"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(probed(plan), s"clustered range query not pruned:\n$plan")
    val inList = "PartitionFilters: \\[[^\\]]*IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan).map(_.group(1).split(",").length).getOrElse(99)
    assert(inList < 4, s"no cells were pruned (IN list has $inList of 4 cells)")
    val exact = shape(emb).collect().map(_.getLong(0)).toSeq
    assert(pruned.collect().map(_.getLong(0)).toSeq == exact)
  }

  test("selective metadata filter widens the probe; exclusion filter does not") {
    def inListSize(df: org.apache.spark.sql.DataFrame): Int =
      "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN \\(([^)]*)\\)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).split(",").length).getOrElse(-1)
    val base = SparkEntry.queries("vs_ivf_auto")(spark, Sf)     // vec_id <> 0 only
    val filtered = SparkEntry.queries("vs_knn_filtered_auto")(spark, Sf) // + label = 3
    val n = graft.queries.VectorQueries.IvfNprobe
    assert(inListSize(base) == n,
      s"exclusion-only probe should stay at nprobe $n, got ${inListSize(base)}")
    assert(inListSize(filtered) == 2 * n,
      s"selective filter should widen the probe to ${2 * n}, got ${inListSize(filtered)}")
  }

  test("plans without a registered store or literal query are untouched") {
    // same shape over the raw embeddings table (no centroid_id, not
    // registered): the rule must not fire
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    val plain = Tables.embeddings(spark, Sf)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
    assert(!plain.queryExecution.optimizedPlan.toString.contains("centroid_id IN"))
    assert(plain.collect().length == 10)
    // query vector from a crossJoin (not a literal): also untouched
    val joined = SparkEntry.queries("vs_knn_l2")(spark, Sf)
    assert(!joined.queryExecution.optimizedPlan.toString.contains("centroid_id"))
  }
}
