package graft

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{Avi, MediaRecord, VideoSpec}
import org.scalatest.funsuite.AnyFunSuite

/** The from-spec RIFF/AVI codec behind mm_video_decode: round-trip
  * exactness, the bottom-up DIB row order, and the 4-byte row padding
  * (the two classic DIB parser mistakes). */
class AviSpec extends SparkSpec {

  test("round-trip preserves every pixel, including padded-stride widths") {
    // width 5 → rowBytes 15 → stride 16: exercises row padding
    for (w <- Seq(4, 5, 7); h <- Seq(3, 6); f <- Seq(1, 4)) {
      val (gw, gh, frames) = Avi.decode(Avi.encode(w, h, f, 20))
      assert(gw == w && gh == h && frames.length == f)
      for (fi <- 0 until f; y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        assert(frames(fi)(p) == 20 + fi, s"B at ($x,$y,$fi)") // B = base+f
        assert(frames(fi)(p + 1) == 20 + y, s"G at ($x,$y,$fi)") // G = base+y
        assert(frames(fi)(p + 2) == 20 + x, s"R at ($x,$y,$fi)") // R = base+x
      }
    }
  }

  test("decoded frames are top-down: a forgotten DIB flip is caught") {
    // G = base+y with a non-symmetric height: row 0 must be base, not base+h-1
    val (_, _, frames) = Avi.decode(Avi.encode(3, 4, 1, 7))
    assert(frames(0)(1) == 7) // (x=0, y=0) green
    assert(frames(0)((3 * 3 + 0) * 3 + 1) == 10) // (x=0, y=3) green
  }

  test("malformed payloads are rejected, not misread") {
    intercept[IllegalArgumentException](Avi.decode("RIFFxxxxWAVE".getBytes))
    val ok = Avi.encode(4, 3, 2, 0)
    // truncating the movi list drops a declared frame
    intercept[Exception](Avi.decode(ok.dropRight(60)))
  }

  test("batch decode over the Spark plumbing yields closed-form sums") {
    implicit val sp = spark
    import spark.implicits._
    val specs = Seq(VideoSpec(1L, 5, 4, 3, 10), VideoSpec(2L, 16, 8, 2, 100)).toDS()
    val got = Multimodal.decodeAvis(Multimodal.synthesizeAvis(specs))
      .collect().sortBy(_.doc_id)
    def sums(w: Long, h: Long, f: Long, b: Long) = (
      f * h * (w * b + w * (w - 1) / 2), // sum_r
      f * w * (h * b + h * (h - 1) / 2), // sum_g
      w * h * (f * b + f * (f - 1) / 2), // sum_b
      f * w * (b * h * (h - 1) / 2 + (h - 1) * h * (2 * h - 1) / 6)) // sum_yg
    for ((g, (w, h, f, b)) <- got.zip(Seq((5L, 4L, 3L, 10L), (16L, 8L, 2L, 100L)))) {
      val (sr, sg, sb, syg) = sums(w, h, f, b)
      assert(g.width == w && g.height == h && g.n_frames == f && g.n_px == w * h * f)
      assert(g.sum_r == sr && g.sum_g == sg && g.sum_b == sb && g.sum_yg == syg)
    }
  }
}
