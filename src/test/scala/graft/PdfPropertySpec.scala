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

  property("roundTripEncryptedRc4") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.writeEncrypted(pages)) == pages
  }

  property("roundTripEncryptedAes") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.writeEncrypted(pages, aes = true)) == pages
  }

  property("roundTripModern") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.writeModern(pages)) == pages
  }

  property("roundTripModernEncrypted") = forAll(pagesGen) { pages =>
    Pdf.extractPages(Pdf.writeModern(pages, encrypt = true)) == pages
  }

  // corrupt input must never throw: random bytes parse to zero pages,
  // and truncating a valid PDF anywhere yields a (possibly empty)
  // result, not an exception — one bad file must not kill a 100 TB job
  private val garbageGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("garbageNeverThrows") = forAll(garbageGen) { bytes =>
    Pdf.extractPages(bytes).forall(_ != null)
  }

  private val truncatedGen: Gen[(List[String], Int)] = for {
    pages <- pagesGen
    cut <- Gen.choose(0, 100)
  } yield (pages, cut)

  property("truncatedPdfNeverThrows") = forAll(truncatedGen) { case (pages, pct) =>
    val full = Pdf.write(pages)
    val cut = java.util.Arrays.copyOf(full, full.length * pct / 100)
    Pdf.extractPages(cut).forall(_ != null)
  }

  property("truncatedEncryptedNeverThrows") = forAll(truncatedGen) { case (pages, pct) =>
    val full = Pdf.writeModern(pages, encrypt = true)
    val cut = java.util.Arrays.copyOf(full, full.length * pct / 100)
    Pdf.extractPages(cut).forall(_ != null)
  }

  property("embeddedKeywordsRoundTrip") = forAll(Gen.choose(0, 5)) { n =>
    // hostile content: structural keywords INSIDE page text, written
    // UNCOMPRESSED so they appear verbatim in the raw bytes — the
    // object scanner's stream-extent guard must skip them
    val page = ("endstream 1 0 obj stream trailer startxref %%EOF " * (n + 1)).trim
    Pdf.extractPages(Pdf.write(Seq(page), compress = false)) == Seq(page)
  }
}
