package graft

import graft.functions.VectorDistance
import graft.operators.IvfIndex
import graft.plans.{IvfCatalog, IvfProbeRule}
import graft.sources.GraftTable
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** IvfProbeRule × GraftTable (VERDICT r7 #8): when the registered
  * store is a transaction-log table, the probe's cell set must ALSO
  * prune the scan's FILE list via the commit log's per-file
  * centroid_id stats — file skipping stacked under the injected cell
  * filter. The fixture appends each cell as its own commit, so file →
  * cell is 1:1 and the assertion is exact: a 1-cell probe plans over
  * exactly that cell's file. */
class IvfGraftSpec extends SparkSpec {

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length.toLong
    }.sum

  private def buildPerCellTable(dir: String, nlist: Int): (GraftTable, org.apache.spark.sql.DataFrame) = {
    val (indexed, centroids) = IvfIndex.buildIndex(
      Tables.embeddings(spark, Sf), "vec_id", "embedding",
      nlist = nlist, spill = 1)
    val cells = indexed.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val first = indexed.filter(col("centroid_id") === cells.head).coalesce(1)
    val t = GraftTable.create(spark, dir, first,
      statsCols = Seq("centroid_id", "vec_id"))
    cells.tail.foreach { c =>
      t.append(indexed.filter(col("centroid_id") === c).coalesce(1))
    }
    (t, centroids)
  }

  test("1-cell probe over a GraftTable store plans over only that cell's file") {
    val dir = java.nio.file.Files.createTempDirectory("ivfgraft").toString + "/table"
    val (t, centroids) = buildPerCellTable(dir, nlist = 8)
    IvfCatalog.registerTable(t, centroids, nprobe = 1)
    IvfProbeRule.install(spark)
    try {
      val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
      val knn = t.read()
        .select(col("vec_id"),
          VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(5)
      // the probe fired (cell filter in the optimized plan)...
      val opt = knn.queryExecution.optimizedPlan.toString
      assert(opt.contains("centroid_id"), s"probe did not fire:\n$opt")
      // ...and file skipping stacked: 8 one-cell files, 1 probed cell
      assert(scanFiles(knn) == 1L,
        s"expected the 1-cell probe to plan over exactly 1 of 8 files, " +
          s"got ${scanFiles(knn)}:\n${knn.queryExecution.executedPlan}")
      assert(knn.collect().length == 5)
    } finally IvfCatalog.invalidate(dir)
  }

  test("nprobe-cell probe bounds the file list; appended files prune via their own commits") {
    val dir = java.nio.file.Files.createTempDirectory("ivfgraft2").toString + "/table"
    val (t, centroids) = buildPerCellTable(dir, nlist = 8)
    IvfCatalog.registerTable(t, centroids, nprobe = 3)
    IvfProbeRule.install(spark)
    try {
      val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 1)
        .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
      def knn = t.read()
        .select(col("vec_id"),
          VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
      assert(scanFiles(knn) <= 3L, s"3-cell probe planned over ${scanFiles(knn)} files")
      // an append AFTER registration still prunes (stats come from the
      // table's log at probe time, not from registration-time state):
      // a far-away synthetic cell never probed by this query
      val extra = t.read().limit(4)
        .withColumn("centroid_id", lit(9999))
      t.append(extra.coalesce(1))
      assert(scanFiles(knn) <= 3L,
        s"post-append probe planned over ${scanFiles(knn)} files (cell-9999 file must prune)")
      assert(knn.collect().length == 10)
    } finally IvfCatalog.invalidate(dir)
  }

  test("vs_ivf_txn inventory query: probe + file skip keep useful recall vs exact") {
    val approx = SparkEntry.queries("vs_ivf_txn")(spark, Sf)
      .collect().map(_.getLong(0)).toSet
    val (tableP, _) = graft.queries.VectorQueries.ensureTxnStore(spark, Sf)
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
    val exact = GraftTable.open(spark, tableP).read()
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .collect().take(10).map(_.getLong(0)).toSet
    assert(approx.size == 10)
    // spill=1 at nprobe 6/32: lower floor than the spill-2 auto store
    assert((approx & exact).size >= 6, s"recall too low: $approx vs $exact")
  }
}
