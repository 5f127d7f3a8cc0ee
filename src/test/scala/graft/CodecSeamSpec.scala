package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{DecodeStub, MediaRecord}

/** The codec-stub seam must stay honest (VERDICT r7 "next" #9): the
  * stub serves ONLY the declared codec-compressed formats
  * (H.264/AAC) the sandbox has no libraries for, refuses any format
  * the engine decodes for real with an error naming the mime, and no
  * mm_* inventory query routes a real format through it. */
class CodecSeamSpec extends SparkSpec {

  private def rec(mime: String) =
    MediaRecord(1L, mime, "payload-bytes".getBytes("UTF-8"))

  test("stub decodes the declared codec-compressed mimes deterministically") {
    DecodeStub.StubbedMimes.foreach { m =>
      val a = DecodeStub.decode(rec(m))
      val b = DecodeStub.decode(rec(m))
      assert(a.feature.toSeq == b.feature.toSeq && a.feature.length == DecodeStub.FeatureDim)
    }
  }

  test("stub refuses every real-decoder format, naming the mime") {
    DecodeStub.RealDecoderMimes.foreach { m =>
      val e = intercept[IllegalArgumentException](DecodeStub.decode(rec(m)))
      assert(e.getMessage.contains(m), s"error does not name the refused mime $m")
      assert(e.getMessage.contains("real decoder"),
        "error does not say a real decoder exists")
    }
  }

  test("stub names the codec when handed an undeclared compressed format") {
    val e = intercept[IllegalArgumentException](DecodeStub.decode(rec("video/h265")))
    assert(e.getMessage.contains("video/h265"))
    assert(e.getMessage.contains("no stub"))
  }

  test("stub-bound demo records carry only stubbed mimes; real formats never reach the stub") {
    implicit val s = spark
    val mimes = Multimodal.mediaRecords(Tables.documents(spark, Sf).limit(50))
      .collect().map(_.mime).toSet
    assert(mimes.nonEmpty && mimes.subsetOf(DecodeStub.StubbedMimes), mimes.toString)
    // and the inventory queries never touch the stub at all — the
    // real-format queries (mm_image/audio/video/pdf/jpeg_decode) go
    // through their real decoders
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/queries/MultimodalQueries.scala")), "UTF-8")
    val refs = src.linesIterator.filter(_.contains("DecodeStub"))
      .filterNot(_.trim.startsWith("*")).toSeq
    assert(refs.isEmpty, s"mm_* queries reference DecodeStub: $refs")
  }
}
