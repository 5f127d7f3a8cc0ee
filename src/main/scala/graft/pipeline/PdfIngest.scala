package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark plumbing for binary-PDF ingestion — the reference's entry
  * point (blob-trigger on a PDF upload → per-page text, Function.java:
  * 92-135) re-expressed as: `binaryFile` source → per-file page
  * extraction → the existing normalize → chunk → embed → store
  * pipeline ([[Ingest.toVectorStore]] with `pageCol`).
  *
  * Scale shape: one row per file from the source, parsing is a pure
  * per-row map (no shuffle, embarrassingly parallel across
  * executors); pages explode in-task. A 100 TB PDF corpus is bounded
  * by scan + CPU only — the same plan as the 500-file spec run.
  */
object PdfIngest {

  /** Binary PDFs as (path, modificationTime, length, content). */
  def readBinaryPdfs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)

  /** Deterministic PDF synthesis from text (pageChars-char pages) —
    * real Flate-compressed PDF bytes for tests and for queries that
    * need a binary corpus; production reads actual files via
    * [[readBinaryPdfs]]. */
  def syntheticPdf(pageChars: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      val pages =
        if (text == null || text.isEmpty) Seq("")
        else text.grouped(pageChars).toSeq
      Pdf.write(pages)
    }

  /** [[syntheticPdf]], but encrypted with the standard security
    * handler — half the corpus RC4-128 (R3), half AES-128 (R4/AESV2),
    * chosen deterministically per document so one fixture set
    * exercises both cipher paths at scale. Same page slicing, so the
    * pagination oracle is unchanged: decryption is provably
    * transparent to extraction. */
  def syntheticEncryptedPdf(pageChars: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: String, text: String) =>
      val pages =
        if (text == null || text.isEmpty) Seq("")
        else text.grouped(pageChars).toSeq
      Pdf.writeEncrypted(pages, aes = id != null && (id.hashCode & 1) == 1)
    }

  /** [[syntheticPdf]] in the CONTEMPORARY file shape (xref stream +
    * object streams, [[Pdf.writeModern]]); half the corpus is
    * additionally AES-encrypted (deterministic per-id choice), so one
    * fixture set covers the modern layout with and without the
    * security handler. Same page slicing → same pagination oracle. */
  def syntheticModernPdf(pageChars: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: String, text: String) =>
      val pages =
        if (text == null || text.isEmpty) Seq("")
        else text.grouped(pageChars).toSeq
      Pdf.writeModern(pages, encrypt = id != null && (id.hashCode & 1) == 1)
    }

  /** Per-file page extraction is inherently imperative (object graph,
    * inflate, operator scan), so a scalar UDF is the right tier — the
    * same justification as the reference-port chunker.
    *
    * Totality: the parser is repair-style and defensive, and any
    * residual parse failure yields ZERO pages for that file rather
    * than an exception — at 100 TB one corrupt upload must not kill
    * the ingest job (the reference's per-blob trigger has the same
    * isolation for free; a corpus-wide Spark job has to choose it). */
  private val pagesUdf = udf { bytes: Array[Byte] =>
    if (bytes == null) Seq.empty[String]
    else try Pdf.extractPages(bytes)
    catch { case scala.util.control.NonFatal(_) => Seq.empty[String] }
  }

  /** One row per (file, page): carries `carry` columns through and
    * adds (page_number [1-based, as in the reference store], page_text). */
  def pages(files: DataFrame, contentCol: String = "content",
      carry: Seq[String] = Seq("path")): DataFrame =
    files
      .select(carry.map(col) :+ pagesUdf(col(contentCol)).as("__pages"): _*)
      .select(carry.map(col) :+ posexplode(col("__pages")).as(Seq("__pi", "page_text")): _*)
      .select(carry.map(col) :+ (col("__pi") + 1).cast("long").as("page_number")
        :+ col("page_text"): _*)

  /** The reference's blob-trigger, literally: a STREAM of PDF uploads
    * (Structured Streaming binaryFile file source watching `dir`) →
    * per-page extraction → chunk → embed → store rows appended
    * exactly-once. Every transform is stateless per-row, so there is
    * no streaming state to bound.
    *
    * The sink is the GraftTable-backed live store
    * ([[graft.sources.VectorStore.streamIngestTable]]'s mechanics):
    * each micro-batch lands as ONE atomic ACID commit carrying the
    * batch's txn watermark, so exactly-once holds at the table level
    * (a replayed batch is a no-op commit), concurrent KNN readers
    * get snapshot isolation mid-ingest, and a later document
    * re-upload can DELETE its chunks copy-on-write. Read the result
    * with `VectorStore.openTable(spark, storePath).read()`. */
  def streamPdfDir(spark: SparkSession, dir: String, storePath: String,
      checkpoint: String, dims: Int = 64, maxLen: Int = 120, lookback: Int = 30)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // streaming file sources require an explicit schema; binaryFile's
    // is fixed by the format
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
    val pg = pages(files)
      .withColumn("filename", regexp_extract(col("path"), "[^/]+$", 0))
    val rows = Ingest.toVectorStore(pg, "filename", "page_text", "filename",
      pageCol = Some("page_number"), dims = dims, maxLen = maxLen, lookback = lookback)
    graft.sources.VectorStore.ensureTable(spark, storePath, rows)
      .streamAppend(rows, checkpoint,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
  }

  /** Full reference flow from a directory of PDFs to vector-store
    * rows: extract pages → chunk (reference punctuation look-back) →
    * embed → DOCUMENT_SEARCH_VECTOR schema with the TRUE pagenumber
    * and a distinct chunk_idx. */
  def pdfDirToVectorStore(spark: SparkSession, dir: String,
      dims: Int = 64, maxLen: Int = 120, lookback: Int = 30): DataFrame = {
    val pg = pages(readBinaryPdfs(spark, dir))
      .withColumn("filename", regexp_extract(col("path"), "[^/]+$", 0))
    // id = filename#page#chunk_idx — unique per chunk, page carried
    Ingest.toVectorStore(pg, "filename", "page_text", "filename",
      pageCol = Some("page_number"), dims = dims, maxLen = maxLen, lookback = lookback)
  }
}
