package graft.sources

import graft.pipeline.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The engine's vector store — the Spark-native stand-in for the
  * reference's `DOCUMENT_SEARCH_VECTOR` pgvector table (README.md
  * DDL: id, embedding, origntext, filename, pagenumber).
  *
  * Layouts:
  *  - [[write]]/[[read]]: plain parquet, columnar + predicate
  *    pushdown; fine for full-scan KNN.
  *  - [[writeBucketed]]: hash-bucketed by id (saveAsTable) so id
  *    lookups and store⋈store joins co-locate without a shuffle.
  *  - IVF layout: [[graft.operators.IvfIndex.writePartitioned]] —
  *    cell-partitioned for partition-pruned probes.
  *  - [[streamIngest]]: continuous ingest, the Structured Streaming
  *    twin of the reference's blob-trigger function — each
  *    micro-batch lands append-only parquet, exactly-once via
  *    checkpoint.
  */
object VectorStore {

  def write(store: DataFrame, path: String): Unit =
    store.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hash-bucketed by id, ONE sorted file per bucket: the repartition
    * aligns write tasks to buckets (HashPartitioning and bucket id
    * are the same pmod(murmur3, n)), so a later bucket-key join or
    * aggregation needs neither Exchange NOR Sort (Spark only trusts
    * per-bucket sort order with a single file per bucket — multiple
    * writers per bucket would silently re-introduce the join-time
    * sort), and the file count is `buckets`, not tasks × buckets. */
  def writeBucketed(store: DataFrame, table: String, buckets: Int = 64): Unit =
    store.repartition(buckets, col("id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet")
      .saveAsTable(table)

  // -------------------------------------------------- store maintenance
  /** Rewrite the store keeping rows where `keep` holds (None = all),
    * re-sized to ~`targetFileBytes` parquet files, then atomically
    * swap directories. This is the maintenance pass a continuously
    * ingested store needs at scale:
    *  - [[compact]]: streaming appends produce a file per micro-batch
    *    task; thousands of tiny files poison scan planning and
    *    footer-read costs. Periodic compaction restores right-sized
    *    files.
    *  - [[delete]]: the reference's document-removal admin operation
    *    (a pgvector `DELETE FROM DOCUMENT_SEARCH_VECTOR WHERE
    *    filename = ?`) — parquet is immutable, so deletion is a
    *    filtered rewrite.
    *
    * Swap = write to `<path>.rewrite`, rename old → `<path>.old`,
    * new → path, drop old. Directory rename is atomic on POSIX/HDFS
    * filesystems; an object store would put an ACID table layer (or a
    * manifest) in front instead — documented deviation, the dataflow
    * is identical. Readers started before the swap keep their file
    * listing, like any snapshotless table.
    *
    * Crash safety: a failure between the two renames leaves the data
    * at `<path>.old` and nothing at `path`; the next call (or
    * [[recover]]) detects that state and rolls the old directory back
    * before proceeding. `.old` is only ever deleted while `path`
    * holds a complete copy (up front, when making room for the swap,
    * and at the end, after the new directory is verified in place).
    * Returns rows kept. */
  def rewrite(spark: SparkSession, path: String,
      keep: Option[org.apache.spark.sql.Column],
      targetFileBytes: Long = 128L << 20): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".rewrite")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    recover(fs, hPath, old)
    fs.delete(tmp, true) // stale partial rewrite from a dead run
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val kept = keep.foldLeft(spark.read.parquet(path))((df, c) => df.filter(c))
    kept.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    fs.delete(old, true) // safe: `path` still holds a complete copy
    require(fs.rename(hPath, old), s"swap failed: could not move $path aside")
    require(fs.rename(tmp, hPath), s"swap failed: could not promote $tmp")
    fs.delete(old, true)
    n
  }

  /** Roll back a half-swapped store (data at `.old`, nothing at
    * `path`) left by a crash between [[rewrite]]'s two renames. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem,
      hPath: org.apache.hadoop.fs.Path, old: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(hPath) && fs.exists(old)) {
      require(fs.rename(old, hPath),
        s"recovery failed: could not roll back $old to $hPath")
    }

  /** Coalesce small files (streaming-ingest debris) without changing
    * content. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Long =
    rewrite(spark, path, None, targetFileBytes)

  /** Remove rows matching `pred` (filtered rewrite). SQL DELETE
    * semantics: only rows where `pred` evaluates to TRUE are removed —
    * a NULL predicate (e.g. `col === x` on a NULL column) keeps the
    * row, so the keep-filter is `not(pred <=> true)`, not `!pred`
    * (which would silently drop NULL-predicate rows). */
  def delete(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column,
      targetFileBytes: Long = 128L << 20): Long =
    rewrite(spark, path, Some(not(pred <=> lit(true))), targetFileBytes)

  /** documents stream → chunk → embed → parquet append. */
  def streamIngest(docsStream: DataFrame, path: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      fileCol: String = "source"): StreamingQuery =
    Ingest.toVectorStore(docsStream, idCol, textCol, fileCol)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)
      .start()

  // ----------------------------------- GraftTable-backed live store
  /** The LIVE store: the reference's `DOCUMENT_SEARCH_VECTOR` is a
    * MUTATING table — INSERT per chunk as uploads arrive
    * (Function.java:215-258), DELETE + re-ingest when a document is
    * re-uploaded — so the serving/ingest path sits on the ACID table
    * format ([[GraftTable]]) rather than directory swaps: atomic
    * commits, exactly-once streaming appends via txn watermarks,
    * snapshot isolation for concurrent readers (a KNN query planned
    * mid-ingest reads a consistent version), time travel for
    * debugging a regression ("what did the store serve yesterday"),
    * and per-file [min,max] stats on the delete key so a re-upload's
    * DELETE touches only the files holding that document. The plain
    * layouts above remain the right call for immutable
    * bulk-analytics snapshots (and the IVF layout for probes). */
  val TableStatsCols: Seq[String] = Seq("filename", "id")

  def createTable(spark: SparkSession, path: String, store: DataFrame): GraftTable =
    GraftTable.create(spark, path, store, statsCols = TableStatsCols)

  def openTable(spark: SparkSession, path: String): GraftTable =
    GraftTable.open(spark, path, statsCols = TableStatsCols)

  /** Open-or-create: the streaming sink's first micro-batch races
    * table creation, so the table is created EMPTY (schema from
    * `schemaFrom`, which may be a streaming DataFrame — only its
    * schema is read) before the stream starts. */
  def ensureTable(spark: SparkSession, path: String,
      schemaFrom: DataFrame): GraftTable =
    try openTable(spark, path)
    catch {
      case _: IllegalArgumentException =>
        createTable(spark, path, spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaFrom.schema))
    }

  /** documents stream → chunk → embed → exactly-once ACID appends:
    * each micro-batch is one atomic GraftTable commit carrying the
    * batch's txn watermark, so a batch replayed after a crash
    * between commit and checkpoint ack is a no-op — exactly-once at
    * the TABLE level, not just the checkpoint level. */
  def streamIngestTable(docsStream: DataFrame, path: String,
      checkpoint: String, idCol: String = "doc_id",
      textCol: String = "text", fileCol: String = "source"): StreamingQuery = {
    val rows = Ingest.toVectorStore(docsStream, idCol, textCol, fileCol)
    ensureTable(docsStream.sparkSession, path, rows)
      .streamAppend(rows, checkpoint)
  }

  /** The reference's document-removal admin op (`DELETE FROM
    * DOCUMENT_SEARCH_VECTOR WHERE filename = ?`) on the live table:
    * copy-on-write over ONLY the files whose [min,max] filename
    * range covers the target — on a 100 TB store the rewrite moves
    * that document's files, never the table. */
  def deleteDocument(table: GraftTable, filename: String): Long =
    table.delete(col("filename") === lit(filename))
}
