package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._

/** Shallow-clone invariants: zero-copy at clone time, full
  * independence after (divergent writes, COW isolation, vacuum
  * safety), stats skipping intact on the clone. */
class GraftCloneSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_clone_$tag").toFile
    f.delete()
    f.toString
  }

  private def mkSource(path: String) = {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"doc_$i", i % 7)).toDF("id", "name", "grp")
    // range layout → per-file disjoint id envelopes, so the skipping
    // test has structure to prune on
    GraftTable.create(spark, path, df.repartitionByRange(3, col("id")),
      statsCols = Seq("id"))
  }

  test("clone reads the source snapshot without copying any data file") {
    val srcPath = freshDir("src"); val dstPath = freshDir("dst")
    val src = mkSource(srcPath)
    val clone = src.cloneTo(dstPath)
    assert(clone.read().count() == 300L)
    assert(clone.read().orderBy("id").collect().toSeq ==
      src.read().orderBy("id").collect().toSeq)
    // zero data files under the clone root — only the log
    val dataFiles = new java.io.File(dstPath).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(dataFiles.isEmpty, s"clone copied data: ${dataFiles.toSeq}")
  }

  test("clone and source diverge independently after the clone point") {
    import spark.implicits._
    val srcPath = freshDir("src2"); val dstPath = freshDir("dst2")
    val src = mkSource(srcPath)
    val clone = src.cloneTo(dstPath)
    clone.append(Seq((1000L, "doc_1000", 0L)).toDF("id", "name", "grp"))
    src.append(Seq((2000L, "doc_2000", 0L)).toDF("id", "name", "grp"))
    assert(clone.read().filter(col("id") === 1000L).count() == 1L)
    assert(clone.read().filter(col("id") === 2000L).count() == 0L)
    assert(src.read().filter(col("id") === 1000L).count() == 0L)
    assert(src.read().filter(col("id") === 2000L).count() == 1L)
  }

  test("copy-on-write delete on the clone never mutates a source file") {
    val srcPath = freshDir("src3"); val dstPath = freshDir("dst3")
    val src = mkSource(srcPath)
    val before = src.read().orderBy("id").collect().toSeq
    val clone = src.cloneTo(dstPath)
    clone.delete(col("id") <= 150L)
    assert(clone.read().count() == 150L)
    // the source's content AND physical file set are untouched
    assert(src.read().orderBy("id").collect().toSeq == before)
    // the clone's rewrite landed under the CLONE root
    val rewritten = new java.io.File(dstPath).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(rewritten.nonEmpty, "COW rewrite must write under the clone root")
  }

  test("vacuum on the clone cannot delete source files") {
    val srcPath = freshDir("src4"); val dstPath = freshDir("dst4")
    val src = mkSource(srcPath)
    val clone = src.cloneTo(dstPath)
    clone.delete(col("id") <= 150L) // makes the source-file refs dead in the clone
    val srcFilesBefore = new java.io.File(srcPath).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    clone.vacuum(retainVersions = 1)
    val srcFilesAfter = new java.io.File(srcPath).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    assert(srcFilesAfter == srcFilesBefore,
      "clone vacuum reached into the source directory")
    assert(clone.read().count() == 150L)
  }

  test("stats-based data skipping works unchanged on the clone") {
    val srcPath = freshDir("src5"); val dstPath = freshDir("dst5")
    val src = mkSource(srcPath)
    val clone = src.cloneTo(dstPath)
    val all = clone.candidateFiles(lit(true)).size
    val pruned = clone.candidateFiles(col("id") === 5L).size
    assert(pruned < all, s"clone lost data skipping: $pruned of $all")
    assert(clone.readWhere(col("id") === 5L).count() == 1L)
  }

  test("time travel on the clone resolves clone-local history") {
    import spark.implicits._
    val srcPath = freshDir("src6"); val dstPath = freshDir("dst6")
    val src = mkSource(srcPath)
    val clone = src.cloneTo(dstPath)
    val v1 = clone.version
    clone.append(Seq((1000L, "doc_1000", 0L)).toDF("id", "name", "grp"))
    assert(clone.read(v1).count() == 300L)
    assert(clone.read().count() == 301L)
  }
}
