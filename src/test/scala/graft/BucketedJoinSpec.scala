package graft

import graft.sources.VectorStore
import org.apache.spark.sql.functions._

/** Proof that [[VectorStore.writeBucketed]] buys what it claims at
  * 100 TB: a store⋈store join on the bucket key plans as a
  * SortMergeJoin with NO Exchange on either side (both sides arrive
  * pre-partitioned AND pre-sorted from the bucketed layout), and the
  * join result matches the plain-layout join exactly. A store⋈store
  * join shows up in every enrich / backfill / CDC-merge pass; on
  * plain parquet it shuffles BOTH full tables every run, while the
  * bucketed layout pays one shuffle at write time and amortizes it
  * over every later join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed store self-join: SortMergeJoin with zero Exchange, result exact") {
    val store = Tables.embeddings(spark, Sf)
      .select(col("vec_id").as("id"), col("embedding"), col("label"))
    val updates = store.select(col("id"), (col("label") + 1).as("new_label"))

    spark.sql("DROP TABLE IF EXISTS graft_bucket_store")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_updates")
    VectorStore.writeBucketed(store, "graft_bucket_store", buckets = 8)
    VectorStore.writeBucketed(updates, "graft_bucket_updates", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // forbid broadcast (these fixtures are tiny; at store scale both
      // sides are far past any broadcast threshold) and freeze AQE so
      // the asserted plan is the static one
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val joined = spark.table("graft_bucket_store")
        .join(spark.table("graft_bucket_updates"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$plan")

      // The layout is also pre-SORTED within buckets, but since
      // SPARK-24528 the scan only REPORTS that ordering behind the
      // legacy flag (multi-file buckets would silently break it —
      // which is exactly why writeBucketed pins one file per bucket).
      // With the flag on, the join-time per-bucket Sort disappears
      // too; without it the Sort is local CPU, never network.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val sortFree = spark.table("graft_bucket_store")
        .join(spark.table("graft_bucket_updates"), Seq("id"))
      val sfPlan = sortFree.queryExecution.executedPlan.toString
      assert(!sfPlan.contains("Exchange") && !sfPlan.contains("Sort "),
        s"one-file-per-bucket sorted layout must join sort-free:\n$sfPlan")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")

      val exact = store.join(updates, Seq("id"))
        .select("id", "new_label")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val got = joined.select("id", "new_label")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == exact)

      // and a bucket-key aggregation reuses the layout too: no exchange
      val agg = spark.table("graft_bucket_store").groupBy("id").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_store")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_updates")
    }
  }
}
