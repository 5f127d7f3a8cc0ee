package graft

import graft.pipeline.Pdf
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the PDF writer/extractor pair: ANY page
  * texts — including parens, backslashes, control bytes and non-ASCII
  * — must round-trip byte-exactly through write → extractPages, with
  * and without FlateDecode. */
object PdfPropertySpec extends Properties("pdf") {

  private val nastyChars =
    Gen.oneOf('(', ')', '\\', '\n', '\r', '\t', 'a', 'z', ' ', '.', 'é', 'é', '日', '!')
  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(nastyChars).map(_.mkString),
    Gen.listOf(Gen.choose(32.toChar, 0x2fff.toChar)).map(_.mkString))
  private val pagesGen: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, textGen))

  property("roundTripCompressed") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.write(pages)) == pages
  }

  property("roundTripRaw") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.write(pages, compress = false)) == pages
  }
}
