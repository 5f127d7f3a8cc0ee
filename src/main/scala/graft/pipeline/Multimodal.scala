package graft.pipeline

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as opaque `binary`
  * columns with typed metadata, batch decode via mapPartitions.
  *
  * The image/audio/video byte→pixels/samples decode is STUBBED (no
  * media libs in this environment — [[DecodeStub]] is a deterministic
  * fake). The PDF modality is decoded FOR REAL: [[decodePdfs]] runs
  * [[Pdf.extractPages]] (the engine's own ISO 32000 parser) inside the
  * same mapPartitions batch shape, so one modality exercises the whole
  * binary-column path end-to-end with genuine bytes. The Spark-side
  * mechanics are identical across modalities: typed schema,
  * per-partition batch iteration, narrow one-pass execution.
  */
object Multimodal {

  final case class PdfDoc(doc_id: Long, mime: String, bytes: Array[Byte])

  final case class PdfFeatures(doc_id: Long, mime: String,
      n_pages: Long, n_chars: Long, head: String)

  /** REAL decoder for the PDF modality: parse the binary, extract
    * per-page text, derive features. Same batch shape as
    * [[decodeFeatures]] — one decoder instance per partition. */
  def decodePdfs(media: Dataset[PdfDoc])(
      implicit spark: SparkSession): Dataset[PdfFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val pages = Pdf.extractPages(m.bytes)
        PdfFeatures(m.doc_id, m.mime, pages.length.toLong,
          pages.map(_.length.toLong).sum,
          pages.headOption.getOrElse("").take(24))
      }
    }
  }

  final case class MediaRecord(doc_id: Long, mime: String, bytes: Array[Byte])

  final case class MediaFeatures(doc_id: Long, mime: String, byte_len: Long,
      width: Long, height: Long, feature: Array[Double])

  /** Deterministic stand-in for an image/audio/video decoder: features
    * derive only from the bytes, so tests are reproducible. A real
    * deployment swaps this for the native decode, keeping the
    * mapPartitions batch shape. */
  object DecodeStub {
    val FeatureDim = 8
    def decode(m: MediaRecord): MediaFeatures = {
      val h = m.bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
      val pos = math.abs(h)
      val feature = Array.tabulate(FeatureDim)(i => ((pos >> (i * 7)) & 127).toDouble / 127.0)
      MediaFeatures(m.doc_id, m.mime, m.bytes.length.toLong,
        64L + pos % 1920, 64L + (pos / 1920) % 1080, feature)
    }
  }

  /** documents → typed media records (text bytes standing in for blob
    * payloads, as the reference's PDFs live in blob storage). */
  def mediaRecords(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        encode(col("text"), "utf-8").as("bytes"))
      .as[MediaRecord]
  }

  /** Batch decode: one decoder instance per partition, streamed rows —
    * the standard shape for native-library or model-inference UDFs. */
  def decodeFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would init the native decoder here
      it.map(DecodeStub.decode)
    }
  }
}
