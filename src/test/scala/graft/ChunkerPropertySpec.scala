package graft

import graft.pipeline.Ingest
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based chunker coverage: for arbitrary text and split
  * parameters the reference semantics must hold — lossless
  * reassembly, bounded chunk length, split-char placement. */
object ChunkerPropertySpec extends Properties("chunker") {

  private val P = Set('.', ':', ';', '?', '!', ' ')

  private val textGen: Gen[String] = Gen.chooseNum(0, 400).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar,
      2 -> Gen.oneOf(' ', '.', '?', '!', ':', ';'))).map(_.mkString)
  }

  private val paramGen: Gen[(Int, Int)] = for {
    maxLen <- Gen.chooseNum(10, 120)
    lookback <- Gen.chooseNum(1, maxLen - 1)
  } yield (maxLen, lookback)

  property("chunks reassemble losslessly") =
    forAll(textGen, paramGen) { (text, p) =>
      Ingest.splitText(text, p._1, p._2, P).mkString == text
    }

  property("non-final chunks are nonempty and bounded by maxLen") =
    forAll(textGen, paramGen) { (text, p) =>
      val chunks = Ingest.splitText(text, p._1, p._2, P)
      chunks.dropRight(1).forall(c => c.nonEmpty && c.length <= p._1)
    }

  property("split lands on the last split-char in the window, else the hard cut") =
    forAll(textGen, paramGen) { (text, p) =>
      val (maxLen, lookback) = p
      val chunks = Ingest.splitText(text, maxLen, lookback, P)
      if (chunks.length <= 1) true
      else {
        val start = maxLen - lookback
        // reference: scan 0-based indices (start, maxLen] downward
        val window = text.substring(start + 1, maxLen + 1)
        val lastPunct = window.lastIndexWhere(P.contains)
        val expected = if (lastPunct >= 0) start + 1 + lastPunct else start
        chunks.head.length == expected ||
          (expected == 0 && chunks.head.length == maxLen)
      }
    }

  // ------------------------------------------------- CJK-aware set
  private val CjkP = Ingest.CjkPunct.toSet

  /** Mixed-script corpus: latin words, hiragana/kanji-range chars,
    * ASCII and ideographic/fullwidth punctuation interleaved. */
  private val mixedGen: Gen[String] = Gen.chooseNum(0, 400).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      5 -> Gen.alphaLowerChar,
      3 -> Gen.choose(0x3041, 0x3096).map(_.toChar), // hiragana
      2 -> Gen.choose(0x4e00, 0x4eff).map(_.toChar), // CJK ideographs
      1 -> Gen.oneOf(' ', '.', '!', '。', '！', '？', '、', '，'),
    )).map(_.mkString)
  }

  property("CJK: chunks reassemble losslessly on mixed-script text") =
    forAll(mixedGen, paramGen) { (text, p) =>
      Ingest.splitText(text, p._1, p._2, CjkP).mkString == text
    }

  property("CJK: non-final chunks bounded by maxLen on mixed-script text") =
    forAll(mixedGen, paramGen) { (text, p) =>
      Ingest.splitText(text, p._1, p._2, CjkP).dropRight(1)
        .forall(c => c.nonEmpty && c.length <= p._1)
    }

  property("CJK: an ideographic stop in the window IS the boundary (not a hard cut)") =
    forAll(mixedGen, paramGen) { (text, p) =>
      val (maxLen, lookback) = p
      val chunks = Ingest.splitText(text, maxLen, lookback, CjkP)
      if (chunks.length <= 1) true
      else {
        val start = maxLen - lookback
        val window = text.substring(start + 1, maxLen + 1)
        val lastPunct = window.lastIndexWhere(CjkP.contains)
        val expected = if (lastPunct >= 0) start + 1 + lastPunct else start
        chunks.head.length == expected ||
          (expected == 0 && chunks.head.length == maxLen)
      }
    }

  property("CJK set only ADDS boundaries: ASCII-only text chunks identically") =
    forAll(textGen, paramGen) { (text, p) =>
      // vs_chunk oracle parity: on text with no CJK punctuation the
      // CJK-aware set behaves exactly like the reference set + space
      Ingest.splitText(text, p._1, p._2, P) ==
        Ingest.splitText(text, p._1, p._2, P ++ (Ingest.CjkPunct.toSet -- Ingest.ReferencePunct.toSet))
    }
}
