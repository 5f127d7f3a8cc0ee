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

  def writeBucketed(store: DataFrame, table: String, buckets: Int = 64): Unit =
    store.write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet")
      .saveAsTable(table)

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
}
