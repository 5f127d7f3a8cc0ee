package graft

import java.nio.file.Files

import graft.pipeline.{Ingest, Pdf, PdfIngest}
import org.apache.spark.sql.functions._

class PdfSpec extends SparkSpec {

  test("write/extract round-trips page text byte-exactly (compressed + raw)") {
    val pages = Seq(
      "plain ascii text",
      "specials: (parens) \\backslash\\ and )unbalanced(",
      "lines\nand\ttabs and \r carriage  bell",
      "unicode: café 日本語 😀",
      "")
    for (compress <- Seq(true, false)) {
      assert(Pdf.extractPages(Pdf.write(pages, compress)) == pages)
    }
  }

  test("long page splits into many show runs and still round-trips") {
    val text = ("The quick brown fox (jumps) over \\ the lazy dog. " * 40).trim
    assert(Pdf.extractPages(Pdf.write(Seq(text))) == Seq(text))
  }

  test("handcrafted foreign fixture: TJ kerning, hex strings, balanced parens, octal, bad /Length") {
    // Built by hand, not by Pdf.write: scrambled object order, comments,
    // a deliberately wrong /Length (exercises the endstream repair
    // scan), kerning numbers inside TJ, hex string, nested balanced
    // parens, octal escape, and a backslash line continuation.
    val content = "BT /F1 12 Tf (He) Tj (l\\154o ) Tj [(w) -120 (or) 50 (l)] TJ <6421> Tj (. a(b)c and foo\\\nbar) Tj ET"
    val fixture =
      s"""%PDF-1.4
         |% a comment line
         |3 0 obj
         |<< /Length 9999 >>
         |stream
         |$content
         |endstream
         |endobj
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [4 0 R] /Count 1 >>
         |endobj
         |4 0 obj
         |<< /Type /Page /Parent 2 0 R /Contents 3 0 R >>
         |endobj
         |trailer
         |<< /Size 5 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin
    val got = Pdf.extractPages(fixture.getBytes("ISO-8859-1"))
    assert(got == Seq("Hello world!. a(b)c and foobar"))
  }

  test("page /Contents as an array of streams concatenates in order") {
    val fixture =
      """%PDF-1.4
        |1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
        |endobj
        |3 0 obj
        |<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>
        |endobj
        |4 0 obj
        |<< /Length 16 >>
        |stream
        |BT (part one) Tj
        |endstream
        |endobj
        |5 0 obj
        |<< /Length 16 >>
        |stream
        |(part two) Tj ET
        |endstream
        |endobj
        |trailer
        |<< /Root 1 0 R >>
        |%%EOF
        |""".stripMargin
    val got = Pdf.extractPages(fixture.getBytes("ISO-8859-1"))
    assert(got == Seq("part onepart two"))
  }

  test("objects packed in an ObjStm (PDF 1.5 style) resolve: page tree inside the stream") {
    // modern-writer shape: catalog/pages/page live INSIDE an object
    // stream; only the ObjStm container and the content stream are
    // top-level, and there is no classic trailer
    val o2 = "<< /Type /Catalog /Pages 3 0 R >>"
    val o3 = "<< /Type /Pages /Kids [4 0 R] /Count 1 >>"
    val o4 = "<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>"
    val header = s"2 0 3 ${o2.length + 1} 4 ${o2.length + 1 + o3.length + 1} "
    val streamData = header + o2 + " " + o3 + " " + o4
    val content = "BT (packed!) Tj ET"
    val fixture =
      s"""%PDF-1.5
         |1 0 obj
         |<< /Type /ObjStm /N 3 /First ${header.length} /Length ${streamData.length} >>
         |stream
         |$streamData
         |endstream
         |endobj
         |5 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |startxref
         |0
         |%%EOF
         |""".stripMargin
    assert(Pdf.extractPages(fixture.getBytes("ISO-8859-1")) == Seq("packed!"))
  }

  test("binaryFile source yields one row per (file, page); non-PDFs filtered") {
    val dir = Files.createTempDirectory("pdfs")
    Files.write(dir.resolve("a.pdf"), Pdf.write(Seq("page one", "page two")))
    Files.write(dir.resolve("b.pdf"), Pdf.write(Seq("solo")))
    Files.write(dir.resolve("noise.txt"), "not a pdf".getBytes("UTF-8"))
    val rows = PdfIngest.pages(PdfIngest.readBinaryPdfs(spark, dir.toString))
      .withColumn("filename", regexp_extract(col("path"), "[^/]+$", 0))
      .select("filename", "page_number", "page_text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      ("a.pdf", 1L, "page one"), ("a.pdf", 2L, "page two"), ("b.pdf", 1L, "solo")))
  }

  test("streaming PDF uploads land store rows exactly once (blob-trigger twin)") {
    val dir = Files.createTempDirectory("pdfstream")
    val out = Files.createTempDirectory("pdfstreamout")
    Files.write(dir.resolve("a.pdf"), Pdf.write(Seq("first upload page one.", "page two.")))
    val q1 = PdfIngest.streamPdfDir(spark, dir.toString, s"$out/store", s"$out/ckpt")
    q1.processAllAvailable(); q1.stop()
    // a new upload + a RESTARTED query on the same checkpoint: the
    // first file must not re-ingest (exactly-once across restarts)
    Files.write(dir.resolve("b.pdf"), Pdf.write(Seq("second upload.")))
    val q2 = PdfIngest.streamPdfDir(spark, dir.toString, s"$out/store", s"$out/ckpt")
    q2.processAllAvailable(); q2.stop()
    // the sink is the ACID live store: read the GraftTable snapshot
    val table = graft.sources.VectorStore.openTable(spark, s"$out/store")
    val store = table.read()
    assert(store.count() == 3) // 2 pages + 1 page, exactly once
    assert(store.select("filename").distinct().count() == 2)
    assert(store.filter(col("filename") === "a.pdf" && col("pagenumber") === 2L)
      .select("origntext").head.getString(0) == "page two.")

    // the reference's re-upload admin op on the SAME table the stream
    // feeds: DELETE one document copy-on-write...
    val preDelete = table.version
    graft.sources.VectorStore.deleteDocument(table, "a.pdf")
    assert(table.read().select("filename").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("b.pdf"))
    // ...while time travel still serves the pre-delete snapshot
    assert(table.read(atVersion = preDelete).count() == 3)
    // and a RESTARTED stream on the same checkpoint replays nothing
    // (exactly-once at the table level: txn watermark, not re-append)
    val q3 = PdfIngest.streamPdfDir(spark, dir.toString, s"$out/store", s"$out/ckpt")
    q3.processAllAvailable(); q3.stop()
    assert(table.read().count() == 1)
  }

  test("multimodal PDF decoder extracts real features through the batch shape") {
    implicit val sp = spark
    import spark.implicits._
    val media = Seq(
      graft.pipeline.Multimodal.PdfDoc(1L, "application/pdf",
        Pdf.write(Seq("first page text here", "second (page)"))),
      graft.pipeline.Multimodal.PdfDoc(2L, "application/pdf",
        Pdf.write(Seq("solo")))).toDS()
    val got = graft.pipeline.Multimodal.decodePdfs(media)
      .collect().sortBy(_.doc_id)
    assert(got(0).n_pages == 2 && got(0).n_chars == 20 + 13 &&
      got(0).head == "first page text here")
    assert(got(1).n_pages == 1 && got(1).n_chars == 4 && got(1).head == "solo")
  }

  test("pdfDirToVectorStore: long page chunks share the TRUE pagenumber and reassemble") {
    val dir = Files.createTempDirectory("pdfstore")
    val longPage = ("alpha beta. gamma delta? epsilon zeta " * 8).trim // > maxLen 120
    Files.write(dir.resolve("doc.pdf"), Pdf.write(Seq("short page.", longPage)))
    val store = PdfIngest.pdfDirToVectorStore(spark, dir.toString)
    assert(store.columns.toSet ==
      Set("id", "embedding", "origntext", "filename", "pagenumber", "chunk_idx", "status"))
    assert(store.select("filename").distinct().head.getString(0) == "doc.pdf")
    val p2 = store.filter(col("pagenumber") === 2L).orderBy("chunk_idx")
    assert(p2.count() > 1) // reference semantics: one long page, many chunks, one pagenumber
    assert(store.filter(col("pagenumber") === 1L).count() == 1)
    val reassembled = p2.collect().map(_.getAs[String]("origntext")).mkString
    assert(reassembled == longPage) // normalize() is identity here (single spaces)
  }

  // --------------------------------------------- stream filters
  private def hexEncode(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString + ">"

  private def a85Encode(b: Array[Byte]): String = {
    val sb = new StringBuilder
    b.grouped(4).foreach { g =>
      val padded = g.padTo(4, 0.toByte)
      var v = 0L
      padded.foreach(x => v = (v << 8) | (x & 0xff))
      val cs = new Array[Char](5)
      for (i <- 4 to 0 by -1) { cs(i) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(cs, 0, g.length + 1)
    }
    sb.append("~>").toString
  }

  private def rlEncode(b: Array[Byte]): Array[Byte] = {
    // all-literal runs of ≤128 bytes + EOD — valid, if not minimal
    val out = new java.io.ByteArrayOutputStream
    b.grouped(128).foreach { g => out.write(g.length - 1); out.write(g) }
    out.write(128)
    out.toByteArray
  }

  /** Spec-side LZW encoder (§7.4.4, EarlyChange=1). The encoder's
    * table is one entry AHEAD of the decoder's at each emission, so it
    * widens at size ≥ 2^w where the decoder widens at ≥ 2^w − 1. */
  private def lzwEncode(b: Array[Byte]): Array[Byte] = {
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var next = 258
    var width = 9
    val out = new java.io.ByteArrayOutputStream
    var buf = 0L; var bits = 0
    def put(code: Int): Unit = {
      buf = (buf << width) | code; bits += width
      while (bits >= 8) { out.write(((buf >> (bits - 8)) & 0xff).toInt); bits -= 8 }
    }
    put(256)
    var w = Seq.empty[Byte]
    b.foreach { c =>
      val wc = w :+ c
      if (dict.contains(wc)) w = wc
      else {
        put(dict(w))
        if (next < 4096) { dict(wc) = next; next += 1 }
        if (next >= (1 << width) && width < 12) width += 1
        w = Seq(c)
      }
    }
    if (w.nonEmpty) put(dict(w))
    put(257)
    if (bits > 0) out.write(((buf << (8 - bits)) & 0xff).toInt)
    out.toByteArray
  }

  test("ASCIIHex / ASCII85 / RunLength stream filters decode; chains apply in order") {
    val content = "BT /F1 12 Tf (filtered text survives) Tj ET"
    def onePage(streamObj: String): Array[Byte] =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>
         |endobj
         |$streamObj
         |trailer
         |<< /Root 1 0 R >>
         |%%EOF
         |""".stripMargin.getBytes("ISO-8859-1")
    def streamObj(filter: String, body: Array[Byte]): String =
      s"4 0 obj\n<< /Length ${body.length} /Filter $filter >>\nstream\n" +
        new String(body, "ISO-8859-1") + "\nendstream\nendobj"
    val raw = content.getBytes("ISO-8859-1")
    val expected = Seq("filtered text survives")
    assert(Pdf.extractPages(onePage(streamObj("/ASCIIHexDecode",
      hexEncode(raw).getBytes("ISO-8859-1")))) == expected)
    assert(Pdf.extractPages(onePage(streamObj("/ASCII85Decode",
      a85Encode(raw).getBytes("ISO-8859-1")))) == expected)
    assert(Pdf.extractPages(onePage(streamObj("/RunLengthDecode",
      rlEncode(raw)))) == expected)
    // chain: data is ASCII85( Flate(content) ) → filters array applies
    // ASCII85 first, then Flate (§7.4: listed in decode order)
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    assert(Pdf.extractPages(onePage(streamObj("[/ASCII85Decode /FlateDecode]",
      a85Encode(deflated).getBytes("ISO-8859-1")))) == expected)

    // LZW: (a) the spec-side encoder is pinned to a hand-derived
    // vector — "ABABABA" is codes [256,65,66,258,260,257] at 9 bits
    // MSB-packed — and the engine decoder is pinned to the encoder
    // through the page roundtrips below, so the decoder is
    // transitively pinned to the spec, not just to its own twin
    assert(lzwEncode("ABABABA".getBytes("ISO-8859-1")).toSeq ==
      Seq(0x80, 0x10, 0x48, 0x50, 0x28, 0x24, 0x04).map(_.toByte))
    val abContent = "BT /F1 12 Tf (ABABABA) Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.extractPages(onePage(streamObj("/LZWDecode",
      lzwEncode(abContent)))) == Seq("ABABABA"))
    // (b) long repetitive content forces the 9→10-bit width growth
    //     (>253 table entries) where encoder/decoder early-change
    //     off-by-ones would corrupt everything past code 510
    val longText = (1 to 400).map(i => s"w$i").mkString(" ")
    val longContent = s"BT /F1 12 Tf ($longText) Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.extractPages(onePage(streamObj("/LZWDecode",
      lzwEncode(longContent)))) == Seq(longText))
  }

  // ------------------------------------------- font-aware decoding
  /** Minimal single-page fixture with the given font objects, font
    * resource dict, and content stream (all uncompressed; the repair
    * parser needs no xref). */
  private def fontFixture(fontObjs: String, fontRes: String, content: String): Array[Byte] =
    s"""%PDF-1.4
       |1 0 obj
       |<< /Type /Catalog /Pages 2 0 R >>
       |endobj
       |2 0 obj
       |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
       |endobj
       |3 0 obj
       |<< /Type /Page /Parent 2 0 R /Resources << /Font << $fontRes >> >> /Contents 6 0 R >>
       |endobj
       |$fontObjs
       |6 0 obj
       |<< /Length ${content.length} >>
       |stream
       |$content
       |endstream
       |endobj
       |trailer
       |<< /Root 1 0 R >>
       |%%EOF
       |""".stripMargin.getBytes("ISO-8859-1")

  test("WinAnsiEncoding font decodes cp1252 bytes (what PDFBox does for third-party PDFs)") {
    // \223 \224 = cp1252 curly quotes, \351 = é — garbage under the
    // old raw-UTF-8 decoding, correct text through /Encoding
    val pdf = fontFixture(
      "4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj",
      "/FW 4 0 R",
      "BT /FW 12 Tf (\\223A\\224 caf\\351) Tj ET")
    assert(Pdf.extractPages(pdf) == Seq("“A” café"))
  }

  test("/Encoding dict with /Differences overrides codes; uniXXXX names resolve") {
    val pdf = fontFixture(
      "4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /BaseEncoding /WinAnsiEncoding /Differences [65 /eacute /uni0042 90 /Euro] >> >>\nendobj",
      "/FD 4 0 R",
      "BT /FD 12 Tf (AB x Z) Tj ET")
    // 65→é (named), 66→B (uni0042), 90→€; untouched codes stay WinAnsi
    assert(Pdf.extractPages(pdf) == Seq("éB x €"))
  }

  test("Type0 font with ToUnicode CMap decodes 2-byte codes (bfchar + bfrange)") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <0065006C006C006F>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0041>
        |endbfrange
        |endcmap
        |end end""".stripMargin
    val fontObjs =
      s"""4 0 obj
         |<< /Type /Font /Subtype /Type0 /BaseFont /Fake /Encoding /Identity-H /ToUnicode 5 0 R >>
         |endobj
         |5 0 obj
         |<< /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream
         |endobj""".stripMargin
    val pdf = fontFixture(fontObjs, "/FT 4 0 R",
      "BT /FT 12 Tf <00010002> Tj [<0010> -20 <00110012>] TJ ET")
    // <0001>→H, <0002>→ello (multi-unit bfchar), bfrange 0010..0012→A B C
    assert(Pdf.extractPages(pdf) == Seq("HelloABC"))
  }

  test("malformed /uXXXXXX glyph name above U+10FFFF degrades to one �, not a lost page") {
    // Character.toChars throws above 0x10FFFF; uncaught it would void
    // the whole document (pages() catches per-doc) — the guard keeps
    // every other glyph
    val pdf = fontFixture(
      "4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /BaseEncoding /WinAnsiEncoding /Differences [65 /u110000] >> >>\nendobj",
      "/FB 4 0 R",
      "BT /FB 12 Tf (A ok) Tj ET")
    assert(Pdf.extractPages(pdf) == Seq("� ok"))
  }

  test("bfrange whose last UTF-16 unit would pass 0xFFFF maps the tail to �") {
    val cmap =
      """begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfrange
        |<0010> <0012> <FFFE>
        |endbfrange
        |endcmap""".stripMargin
    val fontObjs =
      s"""4 0 obj
         |<< /Type /Font /Subtype /Type0 /BaseFont /Fake /Encoding /Identity-H /ToUnicode 5 0 R >>
         |endobj
         |5 0 obj
         |<< /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream
         |endobj""".stripMargin
    val pdf = fontFixture(fontObjs, "/FO 4 0 R",
      "BT /FO 12 Tf <001000110012> Tj ET")
    // 0x10→U+FFFE, 0x11→U+FFFF, 0x12 would wrap past 0xFFFF → �
    assert(Pdf.extractPages(pdf) == Seq("￾￿�"))
  }

  test("StandardEncoding uses the Annex D table (quotes, ligatures), not Latin-1") {
    val pdf = fontFixture(
      "4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman /Encoding /StandardEncoding >>\nendobj",
      "/FS 4 0 R",
      // 0x27 quoteright, 0x60 quoteleft, \256 fi ligature, \261 endash
      "BT /FS 12 Tf (it's `q' \\256n \\261 x) Tj ET")
    assert(Pdf.extractPages(pdf) == Seq("it’s ‘q’ ﬁn – x"))
  }

  test("font switches mid-page flush decoding runs; /Resources inherits from /Pages") {
    // Resources on the PARENT Pages node (inheritable attribute);
    // content switches WinAnsi → raw (unknown encoding-less font)
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources << /Font << /FW 4 0 R /FP 5 0 R >> >> >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>
         |endobj
         |4 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>
         |endobj
         |5 0 obj
         |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
         |endobj
         |6 0 obj
         |<< /Length 58 >>
         |stream
         |BT /FW 12 Tf (caf\\351 ) Tj /FP 12 Tf (plain one) Tj ET
         |endstream
         |endobj
         |trailer
         |<< /Root 1 0 R >>
         |%%EOF
         |""".stripMargin.getBytes("ISO-8859-1")
    assert(Pdf.extractPages(pdf) == Seq("café plain one"))
  }

  test("writeModern sizes xref offsets to the file: 3 bytes small, 4 bytes >= 16 MiB") {
    // the in-repo parser byte-scans and never reads the xref widths,
    // so truncated 3-byte offsets in a big file would only corrupt
    // EXTERNAL readers — assert the W entry and the startxref value
    // (the largest offset the stream must encode) directly
    def wEntry(b: Array[Byte]): String = {
      val s = new String(b, "ISO-8859-1")
      "/W \\[1 (\\d+) 2\\]".r.findFirstMatchIn(s).get.group(1)
    }
    def startxref(b: Array[Byte]): Long = {
      val s = new String(b, "ISO-8859-1")
      "startxref\\n(\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    }
    val small = Pdf.writeModern(Seq("tiny page"))
    assert(wEntry(small) == "3" && startxref(small) < (1L << 24))
    // incompressible-ish page content still deflates; skip compression
    // so 90 × 200 KB pages deterministically cross the 3-byte limit
    val big = Pdf.writeModern(
      Seq.tabulate(90)(i => s"p$i " * 50000), compress = false)
    assert(startxref(big) >= (1L << 24),
      s"fixture must exceed 16 MiB, got ${startxref(big)}")
    assert(wEntry(big) == "4")
    // and the file still round-trips through the extractor
    assert(Pdf.extractPages(big).length == 90)
  }
}
