package graft

import graft.plans.{GraftStatsCatalog, GraftStatsRule}
import graft.sources.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Metadata-only aggregate pushdown ([[graft.plans.GraftStatsRule]]):
  * `read().agg(count/min/max)` over a registered GraftTable must plan
  * as a LocalRelation answered from the commit log — zero file scans
  * — with values identical to the real scan; and every soundness
  * guard (filter present, count(col), untracked column, unregistered
  * table) must fall back to the scanning plan, never a wrong answer. */
class GraftStatsRuleSpec extends SparkSpec {

  /** File scans in the physical plan, seen THROUGH AQE's wrapper —
    * collect() on an AdaptiveSparkPlanExec root would not traverse
    * the inner plan and report zero scans for every query. */
  private def scanCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def go(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(go).sum
    }
    go(df.queryExecution.executedPlan)
  }

  private def tmpTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gsr_$tag").toString + "/table"

  private def fixture(tag: String): GraftTable = {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"name_$i", (i % 37).toInt))
      .toDF("k", "name", "grp")
    val t = GraftTable.create(spark, tmpTable(tag), df.repartition(4),
      statsCols = Seq("k"))
    GraftStatsRule.install(spark)
    t
  }

  private def agg3(t: GraftTable, atVersion: Long = -1L): DataFrame =
    t.read(atVersion).agg(
      count(lit(1)).as("row_count"),
      min(col("k")).as("min_k"),
      max(col("k")).as("max_k"))

  test("registered table: agg answered from the log with zero file scans") {
    val t = fixture("basic")
    GraftStatsCatalog.register(t)
    try {
      val df = agg3(t)
      assert(scanCount(df) == 0,
        s"expected a metadata-only plan:\n${df.queryExecution.executedPlan}")
      val r = df.collect()(0)
      assert(r.getLong(0) == 500L && r.getLong(1) == 1L && r.getLong(2) == 500L)
    } finally GraftStatsCatalog.invalidate(t.path)
  }

  test("rewrite tracks mutations and answers time travel at its own version") {
    val t = fixture("mut")
    GraftStatsCatalog.register(t)
    try {
      import spark.implicits._
      t.delete(col("k") > 400L)
      t.append(Seq((1000L, "late", 0)).toDF("k", "name", "grp"))
      val now = agg3(t)
      assert(scanCount(now) == 0)
      assert(now.collect()(0).toSeq == Seq(401L, 1L, 1000L))
      // the v1 snapshot resolves pre-mutation files; the rewrite must
      // answer THAT file list, not the latest snapshot's
      val v1 = agg3(t, atVersion = 1L)
      assert(scanCount(v1) == 0)
      assert(v1.collect()(0).toSeq == Seq(500L, 1L, 500L))
    } finally GraftStatsCatalog.invalidate(t.path)
  }

  test("soundness guards fall back to the scanning plan") {
    val t = fixture("guard")
    GraftStatsCatalog.register(t)
    try {
      // a residual filter makes log totals wrong — must scan
      val filtered = t.read().filter(col("k") <= 10L)
        .agg(count(lit(1)).as("c"))
      assert(scanCount(filtered) == 1)
      assert(filtered.collect()(0).getLong(0) == 10L)
      // count(col) skips NULLs file counts can't see — must scan
      val countCol = t.read().agg(count(col("name")).as("c"))
      assert(scanCount(countCol) == 1)
      // min over a column without per-file stats — must scan
      val untracked = t.read().agg(min(col("grp")).as("m"))
      assert(scanCount(untracked) == 1)
      assert(untracked.collect()(0).getInt(0) == 0)
      // distinct count — must scan
      val dist = t.read().agg(countDistinct(col("grp")).as("c"))
      assert(scanCount(dist) >= 1)
      assert(dist.collect()(0).getLong(0) == 37L)
    } finally GraftStatsCatalog.invalidate(t.path)
  }

  test("unregistered table keeps its scanning plan") {
    val t = fixture("unreg")
    val df = agg3(t)
    assert(scanCount(df) == 1)
    assert(df.collect()(0).toSeq == Seq(500L, 1L, 500L))
  }

  test("string min/max and mixed agg lists rewrite too") {
    import spark.implicits._
    val df = Seq(("apple", 3L), ("pear", 1L), ("zucchini", 2L))
      .toDF("s", "k")
    val t = GraftTable.create(spark, tmpTable("str"), df.coalesce(1),
      statsCols = Seq("s", "k"))
    GraftStatsRule.install(spark)
    GraftStatsCatalog.register(t)
    try {
      val q = t.read().agg(
        min(col("s")).as("lo"), max(col("s")).as("hi"),
        count(lit(1)).as("n"), max(col("k")).as("mk"))
      assert(scanCount(q) == 0)
      assert(q.collect()(0).toSeq == Seq("apple", "zucchini", 3L, 3L))
    } finally GraftStatsCatalog.invalidate(t.path)
  }
}
