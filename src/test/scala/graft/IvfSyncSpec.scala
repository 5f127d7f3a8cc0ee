package graft

import graft.operators.IvfIndex
import graft.sources.GraftTable
import org.apache.spark.sql.functions._

/** CDF-driven index maintenance ([[IvfIndex.syncFromChanges]]): a
  * mutating base GraftTable's change feed keeps the cell-clustered
  * index table in sync — deletes as stats-pruned COW (untouched index
  * files carried by reference), inserts cell-assigned and appended
  * atomically — with the synced index exactly equal to a fresh
  * assignment of the mutated base. */
class IvfSyncSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ivfsync_$tag").toString

  test("change-feed sync: content tracks the base, deletes are COW-bounded") {
    val dir = tmp("roundtrip")
    val emb = Tables.embeddings(spark, Sf)
    val base = GraftTable.create(spark, s"$dir/base", emb,
      statsCols = Seq("vec_id"))
    val v1 = base.version

    val (indexed, centroids) = IvfIndex.buildIndex(
      emb, "vec_id", "embedding", nlist = 8, spill = 1)
    val cells = indexed.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val first = indexed.filter(col("centroid_id") === cells.head).coalesce(1)
    val index = GraftTable.create(spark, s"$dir/index", first,
      statsCols = Seq("centroid_id", "vec_id"))
    cells.tail.foreach { c =>
      index.append(indexed.filter(col("centroid_id") === c).coalesce(1))
    }
    val filesBefore = index.snapshotMetas().map(_.path).toSet

    // mutate the base: delete a handful of ids from ONE cell (so the
    // COW bound is assertable), update one survivor (delete+insert
    // under the same id), and append brand-new vectors
    val delIds = indexed
      .filter(col("centroid_id") === cells.head && col("vec_id") % 5 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(delIds.nonEmpty, "fixture: the first cell holds no id ≡ 1 (mod 5)")
    base.delete(col("vec_id").isin(delIds: _*))
    val updId = indexed.filter(col("centroid_id") === cells.last)
      .agg(max("vec_id")).collect()(0).getLong(0)
    base.delete(col("vec_id") === updId)
    base.append(emb.filter(col("vec_id") === 7)
      .select(lit(updId).as("vec_id"), col("embedding"), col("label")))
    base.append(emb.filter(col("vec_id").between(1, 10))
      .select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding"), col("label")))

    val feed = base.changes(v1)
    val (nDel, nIns) = IvfIndex.syncFromChanges(
      index, feed, "vec_id", "embedding", centroids)
    assert(nDel == delIds.size + 1, s"feed deletes: $nDel")
    assert(nIns == 10 + 1, s"feed inserts: $nIns")

    // exact content contract: the synced index equals a fresh cell
    // assignment of the mutated base (ids AND cells)
    val expected = IvfIndex.assignCells(base.read(), "embedding", centroids, 1)
      .select(col("vec_id"), col("centroid_id"))
    val actual = index.read().select(col("vec_id"), col("centroid_id"))
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty,
      "synced index diverges from fresh assignment of the mutated base")

    // COW bound: only the two touched cells' files were rewritten —
    // every other original file is carried by reference
    val filesAfter = index.snapshotMetas().map(_.path).toSet
    val touchedCells = Set(cells.head, cells.last)
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.size == cells.length - touchedCells.size,
      s"expected ${cells.length - touchedCells.size} untouched cell files " +
        s"carried by reference, got ${carried.size}")

    // search semantics: an appended vector is findable at distance 0,
    // a deleted id is gone
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toArray
    val hit = index.read()
      .select(col("vec_id"),
        graft.functions.VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(2).collect()
    assert(hit.map(_.getLong(0)).toSet == Set(3L, 100003L),
      s"appended twin of vec 3 not found: ${hit.mkString(", ")}")
    assert(index.read().filter(col("vec_id") === delIds.head).isEmpty)

    // and the optimizer probe still file-skips on the SYNCED table:
    // a 1-cell probe over the registered store must plan over a
    // strict subset of the snapshot's files (the rewritten + appended
    // files prune via their own commits, no re-registration)
    graft.plans.IvfCatalog.registerTable(index, centroids, nprobe = 1)
    graft.plans.IvfProbeRule.install(spark)
    try {
      val knn = index.read()
        .select(col("vec_id"),
          graft.functions.VectorDistance.l2(col("embedding"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(2)
      val total = index.snapshotMetas().size
      val scanned = knn.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location.inputFiles.length
      }.sum
      assert(scanned < total,
        s"probe over the synced table scanned all $total files")
      assert(knn.collect().map(_.getLong(0)).toSet == Set(3L, 100003L),
        "probe over the synced table lost the distance-0 twins")
    } finally graft.plans.IvfCatalog.invalidate(index.path)
  }

  test("deleteKeys: COW accounting, no-ops, and serializable base") {
    import spark.implicits._
    val dir = tmp("delkeys")
    val df = (1L to 300L).map(i => (i, s"p_$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$dir/t",
      df.repartitionByRange(3, col("k")).sortWithinPartitions("k"),
      statsCols = Seq("k"))
    val v0 = t.version
    val before = t.snapshotMetas().map(_.path).toSet
    assert(before.size == 3)

    // keys confined to one range file: exactly one file rewritten
    t.deleteKeys(Seq(5L, 17L, 40L).toDF("k"), Seq("k"))
    val after = t.snapshotMetas().map(_.path).toSet
    assert(before.intersect(after).size == 2, "untouched files must carry over")
    assert(t.read().count() == 297)
    assert(t.read().filter(col("k").isin(5L, 17L, 40L)).isEmpty)

    // empty key set and all-miss key set are version no-ops
    val vNow = t.version
    assert(t.deleteKeys(Seq.empty[Long].toDF("k"), Seq("k")) == vNow)
    assert(t.deleteKeys(Seq(99999L).toDF("k"), Seq("k")) == vNow)
    assert(vNow == v0 + 1)
  }
}
