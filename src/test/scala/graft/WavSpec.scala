package graft

import graft.pipeline.Multimodal.Wav
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled canonical WAV encoder (r11 — replaced the per-row
  * `AudioSystem.write` whose synchronized SPI lookup serialized the
  * synthesis stage) must stay BYTE-IDENTICAL to the JDK writer it
  * replaced, and must round-trip through the from-spec RIFF parser. */
class WavSpec extends AnyFunSuite {

  test("encode is byte-identical to the JDK AudioSystem writer") {
    for ((n, base) <- Seq((1, 0), (7, 3), (1000, 0), (2500, 999), (3999, 123))) {
      val ours = Wav.encode(n, base)
      val jdk = Wav.encodeViaJdk(n, base)
      assert(ours.length == jdk.length, s"length for n=$n base=$base")
      assert(java.util.Arrays.equals(ours, jdk), s"bytes for n=$n base=$base")
    }
  }

  test("encode round-trips through the from-spec decoder") {
    val (rate, samples) = Wav.decode(Wav.encode(2500, 999))
    assert(rate == Wav.SampleRate)
    assert(samples.length == 2500)
    assert(samples(0) == 999 && samples(2499) == 999 + 2499)
  }

  test("decode rejects non-WAVE payloads") {
    intercept[IllegalArgumentException] {
      Wav.decode(Array.fill[Byte](64)(0x42))
    }
  }
}
