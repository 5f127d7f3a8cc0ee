package graft

import java.nio.file.Files

import graft.functions.VectorFunctions
import graft.operators.Knn
import graft.sources.VectorStore
import org.apache.spark.sql.functions._

class VectorStoreSpec extends SparkSpec {

  test("round-trip: ingest -> store -> knn search over origntext") {
    val dir = Files.createTempDirectory("vstore").toString
    val docs = Tables.documents(spark, Sf).limit(50)
    val store = graft.pipeline.Ingest.toVectorStore(docs, "doc_id", "text", "source")
    VectorStore.write(store, s"$dir/store")
    val back = VectorStore.read(spark, s"$dir/store")
    assert(back.count() == store.count())
    assert(back.columns.toSet ==
      Set("id", "embedding", "origntext", "filename", "pagenumber", "chunk_idx", "status"))
    // without a page column the whole doc is one page: pagenumber==1,
    // while chunk_idx still counts chunks within it
    assert(back.filter(col("pagenumber") =!= 1L).count() == 0)
    assert(back.filter(col("chunk_idx") > 0L).count() > 0)
    // search the store with one of its own vectors → top hit is itself
    val q = back.filter(col("id") === "0#0").select(col("embedding").as("qvec"))
    val top = Knn.topK(back, "id", "embedding", q, "qvec",
      VectorFunctions.cosineDistance, 1).head
    assert(top.getString(0) == "0#0")
    assert(math.abs(top.getDouble(1)) < 1e-12)
  }

  test("compaction coalesces streaming debris; delete removes by predicate") {
    val dir = Files.createTempDirectory("vmaint").toString
    val docs = Tables.documents(spark, Sf).limit(40)
    val store = graft.pipeline.Ingest.toVectorStore(docs, "doc_id", "text", "source")
    // simulate micro-batch debris: many tiny appends
    store.repartition(8).write.mode("overwrite").parquet(s"$dir/store")
    store.limit(0).write.mode("append").parquet(s"$dir/store") // empty-batch files
    def dataFiles() = new java.io.File(s"$dir/store").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = spark.read.parquet(s"$dir/store").count()
    assert(dataFiles() >= 8)

    val kept = VectorStore.compact(spark, s"$dir/store")
    assert(kept == before)
    assert(dataFiles() == 1) // tiny store → single right-sized file
    assert(spark.read.parquet(s"$dir/store").count() == before)

    val doomed = spark.read.parquet(s"$dir/store")
      .filter(col("pagenumber") === 1L && col("chunk_idx") === 0L).count()
    assert(doomed > 0)
    val left = VectorStore.delete(spark, s"$dir/store",
      col("pagenumber") === 1L && col("chunk_idx") === 0L)
    assert(left == before - doomed)
    val after = spark.read.parquet(s"$dir/store")
    assert(after.count() == before - doomed)
    assert(after.filter(col("chunk_idx") === 0L).count() == 0)
  }

  test("delete keeps NULL-predicate rows (SQL DELETE semantics)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vnull").toString
    // one row with a NULL filename: `filename === "f1"` is NULL there,
    // and DELETE must only remove pred=TRUE rows
    Seq(("a", "f1"), ("b", "f2"), ("c", null))
      .toDF("id", "filename").write.parquet(s"$dir/store")
    val left = VectorStore.delete(spark, s"$dir/store", col("filename") === "f1")
    assert(left == 2)
    val ids = spark.read.parquet(s"$dir/store").select("id")
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("b", "c"), s"NULL-predicate row was dropped: $ids")
  }

  test("rewrite rolls back a half-swapped store left by a crash") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vcrash").toString
    Seq(("a", 1L), ("b", 2L)).toDF("id", "v").write.parquet(s"$dir/store")
    // simulate a crash between rewrite()'s two renames: data at .old,
    // nothing at the store path
    val fs = new org.apache.hadoop.fs.Path(s"$dir/store")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/store"),
      new org.apache.hadoop.fs.Path(s"$dir/store.old")))
    val kept = VectorStore.compact(spark, s"$dir/store")
    assert(kept == 2)
    assert(spark.read.parquet(s"$dir/store").count() == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/store.old")))
  }

  test("streaming ingest lands chunks in the store exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vstream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = VectorStore.streamIngest(
      input.toDF().toDF("doc_id", "text", "source"),
      s"$dir/store", s"$dir/ckpt")
    input.addData((1L, "alpha beta gamma " * 20, "f1"), (2L, "short doc", "f2"))
    q.processAllAvailable()
    q.stop()
    val got = VectorStore.read(spark, s"$dir/store")
    assert(got.count() >= 3) // doc 1 splits into multiple chunks
    assert(got.filter(col("filename") === "f2").count() == 1)
  }
}
