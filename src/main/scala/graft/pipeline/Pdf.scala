package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

/** Minimal self-contained PDF writer + per-page text extractor (the
  * reference ingests binary PDFs and extracts text per page with
  * PDFBox — BlobUploadDetector/src/main/java/com/yoshio3/
  * Function.java:92-135; no PDF library ships in this sandbox, so the
  * subset of ISO 32000 needed for that behavior is implemented here
  * directly on the JDK).
  *
  * Writer ([[write]]): classic-xref PDF 1.4, one content stream per
  * page, optional FlateDecode (java.util.zip), literal strings with
  * full escaping — used by specs and by the PDF ingestion query to
  * synthesize real binary PDFs from the test corpus.
  *
  * Extractor ([[extractPages]]): a repair-style parser — it indexes
  * every `N G obj` in the file rather than trusting the xref table
  * (works for classic and xref-stream files alike), resolves the page
  * tree from the catalog (or by scanning for /Type /Catalog), inflates
  * FlateDecode content streams, and concatenates the show-text
  * operands (Tj, ', ", TJ) of each page's content in stream order.
  *
  * Objects packed in object streams (/Type /ObjStm, PDF 1.5+ — how
  * modern writers store the page tree) are expanded after the scan,
  * so both classic and compressed-xref files resolve.
  *
  * Font-aware text decoding (ISO 32000 §9.6.6/§9.10; what PDFBox's
  * PDFTextStripper does for Function.java:95-135): the extractor
  * tracks the current font across `Tf` operators and decodes each
  * show-op string through that font's mapping —
  *  - /ToUnicode CMap (bfchar/bfrange, 1- or 2-byte codes — covers
  *    CID/Type0 fonts written by modern generators),
  *  - simple /Encoding names (WinAnsiEncoding, MacRomanEncoding via
  *    the JDK charsets) and /Encoding dicts with /Differences
  *    (glyph names resolved through a core Adobe-glyph-list subset
  *    plus uniXXXX/uXXXX forms),
  *  - no font info → bytes decoded as UTF-8, which keeps documents
  *    written by [[write]] (no /Encoding, text stored verbatim)
  *    round-tripping byte-exactly.
  *
  * Stream filters: Flate, ASCIIHex, ASCII85, RunLength, LZW (and
  * chains).
  *
  * Scope (documented limits, honest subset): encryption, LZW and the
  * image codecs (DCT/JPX/CCITT) are not supported; unknown encoding
  * names and font-program-internal (built-in) encodings fall back to
  * Latin-1 (StandardEncoding itself uses the real Annex D table).
  */
object Pdf {

  // ====================================================== writer ======
  /** One PDF document with the given page texts (1 text = 1 page). */
  def write(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val out = new ByteArrayOutputStream()
    val offsets = mutable.ArrayBuffer.empty[Int] // object number -> byte offset
    def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def emit(s: String): Unit = out.write(bytes(s))

    emit("%PDF-1.4\n%âãÏÓ\n") // binary-marker comment line
    val n = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, then (page, content) pairs
    val firstPage = 4
    def pageObj(i: Int) = firstPage + 2 * i
    def contentObj(i: Int) = firstPage + 2 * i + 1

    def beginObj(num: Int): Unit = {
      // pad offsets for any skipped numbers (none in practice)
      while (offsets.length < num) offsets += 0
      offsets(num - 1) = out.size()
      emit(s"$num 0 obj\n")
    }
    offsets.sizeHint(firstPage + 2 * n)
    offsets ++= Seq.fill(firstPage - 1 + 2 * n)(0)

    beginObj(1)
    emit("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    emit(s"<< /Type /Pages /Kids [${(0 until n).map(i => s"${pageObj(i)} 0 R").mkString(" ")}] /Count $n >>\nendobj\n")
    beginObj(3)
    emit("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")

    for (i <- 0 until n) {
      beginObj(pageObj(i))
      emit(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contentObj(i)} 0 R >>\nendobj\n")
      val content = contentStream(pages(i))
      val (body, filter) =
        if (compress) (deflate(content), " /Filter /FlateDecode") else (content, "")
      beginObj(contentObj(i))
      emit(s"<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      emit("\nendstream\nendobj\n")
    }

    val xrefAt = out.size()
    emit(s"xref\n0 ${offsets.length + 1}\n")
    emit("0000000000 65535 f \n")
    offsets.foreach(o => emit(f"$o%010d 00000 n \n"))
    emit(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Page text → content-stream operators. The text is cut into runs
    * so a page is many show ops (exercises run concatenation in the
    * extractor), each a fully-escaped literal string; runs hold the
    * text VERBATIM so extraction is byte-exact concatenation. */
  private def contentStream(text: String): Array[Byte] = {
    val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
    val runs = text.getBytes("UTF-8").grouped(60).toSeq
    if (runs.isEmpty) sb.append("() Tj ")
    else runs.zipWithIndex.foreach { case (run, i) =>
      if (i > 0) sb.append("0 -14 Td ")
      sb.append('(').append(escapeLiteral(run)).append(") Tj ")
    }
    sb.append("ET")
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Escape a byte run for a PDF literal string: backslash specials,
    * balanced-paren specials, and octal for control/8-bit bytes (a raw
    * CR would be EOL-normalized to LF by any conforming reader). */
  private def escapeLiteral(run: Array[Byte]): String = {
    val sb = new StringBuilder
    run.foreach { b =>
      val c = b & 0xff
      c match {
        case '\\' => sb.append("\\\\")
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case _ if c < 0x20 || c > 0x7e => sb.append(f"\\$c%03o")
        case _ => sb.append(c.toChar)
      }
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ==================================================== extractor =====
  private sealed trait Val
  private case class Name(v: String) extends Val
  private case class Str(bytes: Array[Byte]) extends Val
  private case class Num(v: Double) extends Val
  private case class Ref(num: Int) extends Val
  private case class Arr(items: Vector[Val]) extends Val
  private case class Dict(m: Map[String, Val]) extends Val
  private case class Op(name: String) extends Val // content-stream operator / keyword
  private case object NullVal extends Val

  private final class Lexer(val bytes: Array[Byte], var pos: Int) {
    def end: Int = bytes.length
    def peek: Int = if (pos < end) bytes(pos) & 0xff else -1
    private def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int) = c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      while (pos < end) {
        val c = peek
        if (isWs(c)) pos += 1
        else if (c == '%') { while (pos < end && peek != '\n' && peek != '\r') pos += 1 }
        else return
      }
    }
    def startsWith(s: String): Boolean = {
      if (pos + s.length > end) return false
      var i = 0
      while (i < s.length) { if ((bytes(pos + i) & 0xff) != s.charAt(i)) return false; i += 1 }
      true
    }

    /** Next token/value. Numbers followed by `G R` fold into Ref. */
    def next(): Option[Val] = {
      skipWs()
      if (pos >= end) return None
      val c = peek
      if (c == '<' && pos + 1 < end && (bytes(pos + 1) & 0xff) == '<') { pos += 2; Some(dict()) }
      else if (c == '<') { pos += 1; Some(hexString()) }
      else if (c == '(') { pos += 1; Some(literalString()) }
      else if (c == '[') { pos += 1; Some(array()) }
      else if (c == '/') { pos += 1; Some(Name(regularRun())) }
      else if (c == ']' || c == '>' || c == ')' || c == '}' || c == '{') { pos += 1; Some(Op(c.toChar.toString)) }
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) Some(numberOrRef())
      else {
        val w = regularRun()
        if (w.isEmpty) { pos += 1; next() } // unexpected delimiter; skip
        else if (w == "null") Some(NullVal)
        else Some(Op(w)) // true/false/obj/endobj/stream/operators
      }
    }

    private def regularRun(): String = {
      val sb = new StringBuilder
      while (pos < end && !isWs(peek) && !isDelim(peek)) { sb.append(peek.toChar); pos += 1 }
      sb.toString
    }

    private def numberOrRef(): Val = {
      val startNum = regularRun()
      val v = try startNum.toDouble catch { case _: NumberFormatException => 0.0 }
      // lookahead: <int> <int> R  → indirect reference
      if (v >= 0 && v == v.floor && !startNum.contains(".")) {
        val save = pos
        skipWs()
        val gen = regularRun()
        if (gen.nonEmpty && gen.forall(_.isDigit)) {
          skipWs()
          if (pos < end && peek == 'R' &&
              (pos + 1 >= end || isWs(bytes(pos + 1) & 0xff) || isDelim(bytes(pos + 1) & 0xff))) {
            pos += 1
            return Ref(v.toInt)
          }
        }
        pos = save
      }
      Num(v)
    }

    private def dict(): Val = {
      val m = mutable.Map.empty[String, Val]
      while (true) {
        skipWs()
        if (pos >= end) return Dict(m.toMap)
        if (startsWith(">>")) { pos += 2; return Dict(m.toMap) }
        next() match {
          case Some(Name(k)) =>
            next() match {
              case Some(v) => m(k) = v
              case None => return Dict(m.toMap)
            }
          case Some(_) => () // malformed key; skip
          case None => return Dict(m.toMap)
        }
      }
      Dict(m.toMap)
    }

    private def array(): Val = {
      val items = Vector.newBuilder[Val]
      while (true) {
        skipWs()
        if (pos >= end) return Arr(items.result())
        if (peek == ']') { pos += 1; return Arr(items.result()) }
        next() match {
          case Some(Op("]")) => return Arr(items.result())
          case Some(v) => items += v
          case None => return Arr(items.result())
        }
      }
      Arr(items.result())
    }

    private def literalString(): Val = {
      val out = new ByteArrayOutputStream
      var depth = 1
      while (pos < end && depth > 0) {
        val c = peek; pos += 1
        c match {
          case '\\' if pos < end =>
            val e = peek; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (pos < end && peek == '\n') pos += 1 // line continuation
              case '\n' => () // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < end && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
          case '\r' => // EOL normalization: CR and CRLF read as LF
            if (pos < end && peek == '\n') pos += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      Str(out.toByteArray)
    }

    private def hexString(): Val = {
      val out = new ByteArrayOutputStream
      var hi = -1
      while (pos < end && peek != '>') {
        val c = peek; pos += 1
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write(hi * 16 + d); hi = -1 }
        }
      }
      if (peek == '>') pos += 1
      if (hi >= 0) out.write(hi * 16) // odd digit: low nibble 0
      Str(out.toByteArray)
    }
  }

  private final case class PdfObject(value: Val, stream: Option[Array[Byte]])

  /** Index every top-level `N G obj` by scanning the raw bytes —
    * robust to broken/absent xref tables and to xref-stream files.
    * Matches inside stream payloads are skipped via each stream's
    * measured extent. */
  private def indexObjects(bytes: Array[Byte]): Map[Int, PdfObject] = {
    val text = new String(bytes, "ISO-8859-1") // byte-preserving view
    val objRe = """(?s)(\d+)\s+(\d+)\s+obj\b""".r
    val objs = mutable.Map.empty[Int, PdfObject]
    var guard = 0 // skip matches inside a previously measured stream
    for (m <- objRe.findAllMatchIn(text) if m.start >= guard) {
      val num = m.group(1).toInt
      val lex = new Lexer(bytes, m.end)
      lex.next() match {
        case Some(v) =>
          var stream: Option[Array[Byte]] = None
          lex.skipWs()
          if (lex.startsWith("stream")) {
            var s = math.min(lex.pos + "stream".length, bytes.length)
            if (s < bytes.length && bytes(s) == '\r') s += 1
            if (s < bytes.length && bytes(s) == '\n') s += 1
            val len = v match {
              case Dict(d) => d.get("Length") match {
                case Some(Num(n)) => Some(n.toInt)
                case Some(Ref(r)) => // indirect length: resolve if already indexed
                  objs.get(r).map(_.value).collect { case Num(n) => n.toInt }
                case _ => None
              }
              case _ => None
            }
            // trust /Length only when `endstream` actually follows it
            // (allowing the spec's optional EOL); a trusted length is
            // exact, so no EOL trim — a fallback endstream scan must
            // trim the EOL that precedes the keyword
            val e = len.map(l => math.min(math.max(s + l, s), bytes.length)).filter { cand =>
              val idx = text.indexOf("endstream", cand)
              idx >= 0 && idx - cand <= 2
            }.getOrElse {
              val idx = text.indexOf("endstream", s)
              trimEol(bytes, s, if (idx < 0) bytes.length else idx)
            }
            stream = Some(java.util.Arrays.copyOfRange(bytes, s, math.min(math.max(s, e), bytes.length)))
            guard = math.max(guard, e)
          }
          if (!objs.contains(num) || stream.isDefined) objs(num) = PdfObject(v, stream)
        case None => ()
      }
    }
    objs.toMap
  }

  /** The spec writes an EOL before `endstream`; it is not stream data. */
  private def trimEol(bytes: Array[Byte], s: Int, e: Int): Int = {
    var i = e
    if (i > s && bytes(i - 1) == '\n') i -= 1
    if (i > s && bytes(i - 1) == '\r') i -= 1
    i
  }

  /** Expand objects packed inside object streams (/Type /ObjStm,
    * PDF 1.5+): the stream holds `/N` (objnum, offset) integer pairs
    * followed by the serialized objects at `/First` + offset. Modern
    * writers pack most non-stream objects this way, so without this
    * pass the page tree of a typical contemporary PDF is invisible to
    * the object scan. Packed objects never override a same-numbered
    * top-level object (incremental updates win). */
  private def expandObjectStreams(objs: Map[Int, PdfObject]): Map[Int, PdfObject] = {
    val packed = mutable.Map.empty[Int, PdfObject]
    objs.values.foreach { o =>
      (o.value, o.stream) match {
        case (Dict(d), Some(raw))
            if d.get("Type").contains(Name("ObjStm")) =>
          // an ObjStm behind a filter we can't decode must contribute
          // NOTHING: lexing still-compressed bytes would insert garbage
          // objects under arbitrary numbers (unlike a content stream,
          // where pass-through garbage merely extracts no text)
          val data = d.get("Filter") match {
            case Some(Name(f)) =>
              if (SupportedFilters(f)) decodeOne(f, raw) else Array.empty[Byte]
            case Some(Arr(fs)) =>
              val names = fs.collect { case Name(f) => f }
              if (names.forall(SupportedFilters)) names.foldLeft(raw)((a, f) => decodeOne(f, a))
              else Array.empty[Byte]
            case None => raw
            case _ => Array.empty[Byte] // unresolvable filter spec
          }
          val n = d.get("N").collect { case Num(v) => v.toInt }.getOrElse(0)
          val first = d.get("First").collect { case Num(v) => v.toInt }.getOrElse(0)
          if (n > 0 && first > 0 && first <= data.length) {
            val header = new Lexer(data, 0)
            val pairs = (0 until 2 * n).flatMap(_ => header.next()).collect {
              case Num(v) => v.toLong
            }
            pairs.grouped(2).foreach {
              case Seq(num, off) if first + off >= 0 && first + off < data.length =>
                val lex = new Lexer(data, (first + off).toInt)
                lex.next().foreach(v => packed(num.toInt) = PdfObject(v, None))
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    // top-level objects win over packed ones with the same number
    packed.toMap ++ objs
  }

  // ============================================= font decoding ======
  /** Show-op string bytes → text for one font resource. Instances are
    * compared by reference in the extractor to avoid re-flushing when
    * the same font is re-selected. */
  private type FontDecoder = Array[Byte] => String

  /** Default: the writer's own convention (text bytes stored verbatim,
    * decoded as UTF-8 once per contiguous same-font run — runs may
    * split multi-byte sequences, so decoding happens on the
    * accumulated buffer, never per show-op). */
  private val Utf8Decoder: FontDecoder = b => new String(b, "UTF-8")

  private def singleByteDecoder(table: Array[String]): FontDecoder = { bytes =>
    val sb = new StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(table(b & 0xff)))
    sb.toString
  }

  /** 256-entry code→text table from a JDK single-byte charset. */
  private def charsetTable(cs: String): Array[String] =
    Array.tabulate(256)(i => new String(Array(i.toByte), cs))

  private def baseTable(enc: String): Array[String] = enc match {
    case "WinAnsiEncoding" => charsetTable("windows-1252")
    case "MacRomanEncoding" => charsetTable("x-MacRoman")
    case "StandardEncoding" => StandardTable
    case _ => charsetTable("ISO-8859-1") // unknown names: Latin-1 (documented)
  }

  /** Adobe StandardEncoding (ISO 32000 Annex D.2): ASCII except
    * 0x27 = quoteright and 0x60 = quoteleft, with its own high-range
    * layout (accents, ligatures, daggers — NOT Latin-1). Codes absent
    * from the table extract as empty (notdef shows nothing). */
  private lazy val StandardTable: Array[String] = {
    val t = Array.fill(256)("")
    for (c <- 0x20 to 0x7e) t(c) = c.toChar.toString
    t(0x27) = "’"; t(0x60) = "‘"
    val high = Map(
      0xa1 -> "¡", 0xa2 -> "¢", 0xa3 -> "£", 0xa4 -> "⁄", 0xa5 -> "¥",
      0xa6 -> "ƒ", 0xa7 -> "§", 0xa8 -> "¤", 0xa9 -> "'", 0xaa -> "“",
      0xab -> "«", 0xac -> "‹", 0xad -> "›", 0xae -> "ﬁ", 0xaf -> "ﬂ",
      0xb1 -> "–", 0xb2 -> "†", 0xb3 -> "‡", 0xb4 -> "·", 0xb6 -> "¶",
      0xb7 -> "•", 0xb8 -> "‚", 0xb9 -> "„", 0xba -> "”", 0xbb -> "»",
      0xbc -> "…", 0xbd -> "‰", 0xbf -> "¿",
      0xc1 -> "`", 0xc2 -> "´", 0xc3 -> "ˆ", 0xc4 -> "˜", 0xc5 -> "¯",
      0xc6 -> "˘", 0xc7 -> "˙", 0xc8 -> "¨", 0xca -> "˚", 0xcb -> "¸",
      0xcd -> "˝", 0xce -> "˛", 0xcf -> "ˇ",
      0xd0 -> "—", 0xe1 -> "Æ", 0xe3 -> "ª", 0xe8 -> "Ł", 0xe9 -> "Ø",
      0xea -> "Œ", 0xeb -> "º", 0xf1 -> "æ", 0xf5 -> "ı", 0xf8 -> "ł",
      0xf9 -> "ø", 0xfa -> "œ", 0xfb -> "ß")
    high.foreach { case (c, s) => t(c) = s }
    t
  }

  /** Core Adobe-glyph-list subset for /Differences names: ASCII
    * punctuation + Latin letters are their own names' characters via
    * the uni/u forms or the table below; unknown names extract as
    * U+FFFD so dropped glyphs stay visible. */
  private def glyphToUnicode(name: String): String = {
    // uNNNNNN can name up to 0xFFFFFF but Unicode ends at 0x10FFFF;
    // toChars throws above that, and a throw here would discard the
    // whole document (PdfIngest.pages catches NonFatal per doc) — so
    // an invalid name degrades to one replacement char instead.
    def cp(hex: String): String =
      try {
        val c = Integer.parseInt(hex, 16)
        if (Character.isValidCodePoint(c)) new String(Character.toChars(c)) else "�"
      } catch { case _: NumberFormatException => "�" }
    if (name.length == 1) name // a..z A..Z and any single-char name
    else if (name.matches("uni[0-9A-Fa-f]{4}")) cp(name.substring(3))
    else if (name.matches("u[0-9A-Fa-f]{4,6}")) cp(name.substring(1))
    else GlyphNames.getOrElse(name, "�")
  }

  private val GlyphNames: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "Euro" -> "€", "trademark" -> "™",
    "copyright" -> "©", "registered" -> "®", "degree" -> "°",
    "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "ccedilla" -> "ç", "ntilde" -> "ñ", "ugrave" -> "ù",
    "uacute" -> "ú", "ucircumflex" -> "û", "igrave" -> "ì",
    "iacute" -> "í", "ocircumflex" -> "ô", "ograve" -> "ò",
    "oacute" -> "ó", "adieresis" -> "ä", "odieresis" -> "ö",
    "udieresis" -> "ü", "edieresis" -> "ë", "idieresis" -> "ï",
    "Adieresis" -> "Ä", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
    "germandbls" -> "ß", "ae" -> "æ", "AE" -> "Æ",
    "oslash" -> "ø", "Oslash" -> "Ø", "aring" -> "å",
    "Aring" -> "Å", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "dagger" -> "†", "daggerdbl" -> "‡", "section" -> "§",
    "paragraph" -> "¶", "sterling" -> "£", "yen" -> "¥",
    "cent" -> "¢", "florin" -> "ƒ", "Eacute" -> "É",
    "Egrave" -> "È", "Agrave" -> "À", "Ccedilla" -> "Ç")

  /** Fixed-width code walk over the accumulated bytes; unmapped codes
    * extract as U+FFFD (PDFBox renders nothing; the replacement char
    * keeps the loss visible and the output length deterministic). */
  private def cmapDecoder(codeLen: Int, map: Map[Int, String]): FontDecoder = { bytes =>
    val sb = new StringBuilder
    var i = 0
    while (i + codeLen <= bytes.length) {
      var code = 0
      var k = 0
      while (k < codeLen) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
      sb.append(map.getOrElse(code, "�"))
      i += codeLen
    }
    sb.toString
  }

  /** Parse a /ToUnicode CMap stream: codespacerange fixes the code
    * width; bfchar/bfrange fill code → UTF-16BE target mappings
    * (ISO 32000 §9.10.3). Returns (code byte width, mapping). */
  private def parseToUnicode(data: Array[Byte], defaultLen: Int): (Int, Map[Int, String]) = {
    val lex = new Lexer(data, 0)
    val map = mutable.Map.empty[Int, String]
    var codeLen = 0
    var mode = ""
    val operands = mutable.ArrayBuffer.empty[Val]
    def codeOf(s: Array[Byte]): Int = s.foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
    def uniOf(s: Array[Byte]): String = new String(s, "UTF-16BE")
    var tok = lex.next()
    while (tok.isDefined) {
      tok.get match {
        case Op("begincodespacerange") => mode = "codespace"; operands.clear()
        case Op("beginbfchar") => mode = "bfchar"; operands.clear()
        case Op("beginbfrange") => mode = "bfrange"; operands.clear()
        case Op("endcodespacerange") | Op("endbfchar") | Op("endbfrange") =>
          mode = ""; operands.clear()
        case Str(lo) if mode == "codespace" =>
          if (codeLen == 0 && lo.nonEmpty) codeLen = lo.length
        case v if mode == "bfchar" =>
          operands += v
          if (operands.length == 2) {
            (operands(0), operands(1)) match {
              case (Str(c), Str(u)) =>
                if (codeLen == 0 && c.nonEmpty) codeLen = c.length
                map(codeOf(c)) = uniOf(u)
              case _ => ()
            }
            operands.clear()
          }
        case v if mode == "bfrange" =>
          operands += v
          if (operands.length == 3) {
            (operands(0), operands(1), operands(2)) match {
              case (Str(lo), Str(hi), Str(u)) =>
                if (codeLen == 0 && lo.nonEmpty) codeLen = lo.length
                val l = codeOf(lo); val h = codeOf(hi)
                val base = uniOf(u)
                if (base.nonEmpty && h >= l && h - l <= 0xffff) {
                  // only the last UTF-16 unit increments (ISO 32000
                  // 9.10.3); a range whose last unit would pass 0xFFFF
                  // wraps to garbage/unpaired surrogates — map the
                  // overflowing tail to U+FFFD (PDFBox does the same).
                  val lastMax = 0xffff - base.charAt(base.length - 1)
                  var c = l
                  while (c <= h) {
                    if (c - l <= lastMax) {
                      val chars = base.toCharArray
                      chars(chars.length - 1) = (chars(chars.length - 1) + (c - l)).toChar
                      map(c) = new String(chars)
                    } else map(c) = "�"
                    c += 1
                  }
                }
              case (Str(lo), _, Arr(us)) =>
                if (codeLen == 0 && lo.nonEmpty) codeLen = lo.length
                val l = codeOf(lo)
                us.zipWithIndex.foreach {
                  case (Str(u), off) => map(l + off) = uniOf(u)
                  case _ => ()
                }
              case _ => ()
            }
            operands.clear()
          }
        case _ => operands.clear()
      }
      tok = lex.next()
    }
    (if (codeLen > 0) codeLen else defaultLen, map.toMap)
  }

  /** Per-page text, in page-tree order. Empty seq if no page tree. */
  def extractPages(bytes: Array[Byte]): Seq[String] = {
    val objs = expandObjectStreams(indexObjects(bytes))
    def resolve(v: Val): Val = v match {
      case Ref(n) => objs.get(n).map(o => resolve(o.value)).getOrElse(NullVal)
      case other => other
    }
    def dictOf(v: Val): Map[String, Val] = resolve(v) match {
      case Dict(m) => m
      case _ => Map.empty
    }

    // catalog: via trailer /Root when present, else scan for /Type /Catalog
    val trailerRoot: Option[Val] = {
      val text = new String(bytes, "ISO-8859-1")
      val i = text.lastIndexOf("trailer")
      if (i < 0) None
      else {
        val lex = new Lexer(bytes, i + "trailer".length)
        lex.next() match {
          case Some(Dict(m)) => m.get("Root")
          case _ => None
        }
      }
    }
    val catalog: Map[String, Val] = trailerRoot.map(dictOf).filter(_.nonEmpty).getOrElse {
      objs.values.map(o => dictOf(o.value))
        .find(_.get("Type").contains(Name("Catalog"))).getOrElse(Map.empty)
    }

    def streamOf(v: Val): Option[(Map[String, Val], Array[Byte])] = v match {
      case Ref(n) => objs.get(n).flatMap(o => o.stream.map(s => (dictOf(o.value), s)))
      case _ => None
    }
    def decode(dict: Map[String, Val], raw: Array[Byte]): Array[Byte] = {
      val filters = dict.get("Filter").map(resolve) match {
        case Some(Name(f)) => Seq(f)
        case Some(Arr(fs)) => fs.collect { case Name(f) => f }
        case _ => Seq.empty
      }
      filters.foldLeft(raw)((data, f) => decodeOne(f, data))
    }

    // walk the page tree (intermediate /Pages nodes may nest);
    // /Resources is an inheritable page attribute (ISO 32000 7.7.3.4),
    // so the nearest ancestor's dict rides along with each page
    def walk(node: Val, depth: Int, inhRes: Option[Val]): Seq[(Map[String, Val], Option[Val])] = {
      if (depth > 64) return Seq.empty // cyclic/hostile tree guard
      val d = dictOf(node)
      val res = d.get("Resources").orElse(inhRes)
      d.get("Type") match {
        case Some(Name("Page")) => Seq((d, res))
        case _ => resolve(d.getOrElse("Kids", NullVal)) match {
          case Arr(kids) => kids.flatMap(k => walk(k, depth + 1, res))
          case _ => if (d.get("Type").contains(Name("Page"))) Seq((d, res)) else Seq.empty
        }
      }
    }
    val pages = catalog.get("Pages").map(p => walk(p, 0, None)).getOrElse(Seq.empty)

    /** Resource font name → decoder, from the page's (possibly
      * inherited) /Resources /Font dict. Cached per resources value:
      * pages typically share one inherited dict, and rebuilding
      * charset tables / re-parsing ToUnicode streams per page is
      * wasted work linear in page count. */
    val decoderCache = mutable.Map.empty[Option[Val], Map[String, FontDecoder]]
    def fontDecoders(res: Option[Val]): Map[String, FontDecoder] = decoderCache.getOrElseUpdate(res, {
      val fonts = res.map(dictOf).flatMap(_.get("Font")).map(dictOf).getOrElse(Map.empty)
      fonts.map { case (fname, fval) =>
        val fd = dictOf(fval)
        val isType0 = fd.get("Subtype").contains(Name("Type0"))
        val dec: FontDecoder =
          fd.get("ToUnicode").flatMap(streamOf) match {
            case Some((sd, raw)) =>
              val (codeLen, m) = parseToUnicode(decode(sd, raw), if (isType0) 2 else 1)
              cmapDecoder(codeLen, m)
            case None => fd.get("Encoding").map(resolve) match {
              case Some(Name(enc)) if enc != "Identity-H" && enc != "Identity-V" =>
                singleByteDecoder(baseTable(enc))
              case Some(Dict(encD)) =>
                val table = baseTable(encD.get("BaseEncoding")
                  .collect { case Name(n) => n }.getOrElse("StandardEncoding"))
                resolve(encD.getOrElse("Differences", NullVal)) match {
                  case Arr(items) =>
                    var code = 0
                    items.foreach {
                      case Num(n) => code = n.toInt
                      case Name(g) =>
                        if (code >= 0 && code < 256) { table(code) = glyphToUnicode(g); code += 1 }
                      case _ => ()
                    }
                  case _ => ()
                }
                singleByteDecoder(table)
              case _ => Utf8Decoder // no /Encoding (the writer's fonts) or Identity CID without ToUnicode
            }
          }
        fname -> dec
      }
    })

    pages.map { case (page, res) =>
      // /Contents: a ref to one stream, a direct array of refs, or a
      // ref to an array of refs
      val refs: Vector[Val] = page.get("Contents") match {
        case Some(r @ Ref(_)) => resolve(r) match {
          case Arr(items) => items
          case _ => Vector(r)
        }
        case Some(Arr(items)) => items
        case _ => Vector.empty
      }
      val streams = refs.flatMap(streamOf)
      // multiple content streams form one logical stream (ISO 32000
      // 7.8.2): join with a newline so tokens can't fuse across parts
      val content = streams.map { case (d, raw) => decode(d, raw) }
        .reduceOption((a, b) => a ++ Array('\n'.toByte) ++ b)
        .getOrElse(Array.empty[Byte])
      extractText(content, fontDecoders(res))
    }
  }

  /** Show-text operands of one content stream, concatenated in order:
    * Tj, ' (move+show), " (spacing+show), TJ (array of runs with
    * kerning numbers interleaved — numbers are positioning, skipped).
    *
    * Bytes accumulate per contiguous same-font run and are decoded
    * through the font selected by the last `Tf` when the font changes
    * (or at end of stream) — never per show-op, because a multi-byte
    * UTF-8/CID sequence may legally split across runs. */
  private def extractText(content: Array[Byte],
      fonts: Map[String, FontDecoder] = Map.empty): String = {
    val lex = new Lexer(content, 0)
    val out = new StringBuilder
    val pending = new ByteArrayOutputStream
    var dec: FontDecoder = Utf8Decoder
    def flush(): Unit =
      if (pending.size > 0) { out.append(dec(pending.toByteArray)); pending.reset() }
    val operands = mutable.ArrayBuffer.empty[Val]
    var tok = lex.next()
    while (tok.isDefined) {
      tok.get match {
        case Op("Tf") =>
          // operands: /FontName size — unknown names keep the current
          // decoder (a missing resource is not a decoding switch)
          operands.collect { case Name(n) => n }.lastOption
            .flatMap(fonts.get).foreach { d =>
              if (d ne dec) { flush(); dec = d }
            }
          operands.clear()
        case Op("Tj") | Op("'") | Op("\"") =>
          operands.lastOption match {
            case Some(Str(b)) => pending.write(b, 0, b.length)
            case _ => ()
          }
          operands.clear()
        case Op("TJ") =>
          operands.lastOption match {
            case Some(Arr(items)) =>
              items.foreach { case Str(b) => pending.write(b, 0, b.length); case _ => () }
            case _ => ()
          }
          operands.clear()
        case Op(_) => operands.clear() // any other operator consumes its operands
        case v => operands += v
      }
      tok = lex.next()
    }
    flush()
    out.toString
  }

  // ------------------------------------------------ stream filters
  /** Apply one named stream filter (ISO 32000 §7.4). Flate (zlib) plus
    * the three pure-transform filters a text pipeline meets in the
    * wild: ASCIIHex, ASCII85, RunLength (abbreviated inline-image
    * names accepted too). DCT/JPX/CCITT are image codecs — image XObjects
    * don't reach the text extractor; unknown filters pass through
    * (documented). */
  private val SupportedFilters = Set(
    "FlateDecode", "Fl", "ASCIIHexDecode", "AHx",
    "ASCII85Decode", "A85", "RunLengthDecode", "RL",
    "LZWDecode", "LZW")

  private def decodeOne(filter: String, data: Array[Byte]): Array[Byte] = filter match {
    case "FlateDecode" | "Fl" => inflate(data)
    case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
    case "ASCII85Decode" | "A85" => ascii85Decode(data)
    case "RunLengthDecode" | "RL" => runLengthDecode(data)
    case "LZWDecode" | "LZW" => lzwDecode(data)
    case _ => data
  }

  /** LZW (§7.4.4): MSB-first variable-width codes 9→12 bits, 256 =
    * clear table, 257 = EOD, EarlyChange=1 (the spec default — the
    * width bumps one code early; a /DecodeParms EarlyChange 0 stream
    * is not expected from text-producing writers). Predictors, as for
    * Flate, are image-data machinery and not applied. Corrupt input
    * yields the bytes decoded so far (repair-parser philosophy). */
  private def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3)
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      var b = 0
      while (b < 256) { table += Array(b.toByte); b += 1 }
      table += null; table += null // 256 clear, 257 EOD
    }
    resetTable()
    var width = 9
    var buf = 0L
    var bits = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (i < data.length && !done) {
      buf = (buf << 8) | (data(i) & 0xff); bits += 8; i += 1
      while (bits >= width && !done) {
        val code = ((buf >> (bits - width)) & ((1L << width) - 1)).toInt
        bits -= width
        if (code == 256) { resetTable(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < 256) table(code)
            else if (code < table.length && table(code) != null) table(code)
            else if (prev != null && code == table.length) prev :+ prev(0) // KwKwK
            else { done = true; null } // corrupt stream
          if (entry != null) {
            out.write(entry, 0, entry.length)
            if (prev != null && table.length < 4096) table += (prev :+ entry(0))
            prev = entry
            // EarlyChange=1: widen when the next code wouldn't fit
            if (table.length >= (1 << width) - 1 && width < 12) width += 1
          }
        }
      }
    }
    out.toByteArray
  }

  /** Hex pairs, whitespace ignored, `>` is EOD, odd trailing digit
    * completes with low nibble 0 (§7.4.2). */
  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write(hi * 16 + d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    out.toByteArray
  }

  /** Base-85: 5 chars `!`..`u` → 4 bytes; `z` → four zero bytes; a
    * final partial group of n chars yields n−1 bytes (pad with `u`);
    * `~>` is EOD; whitespace ignored (§7.4.3). */
  private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      var k = n
      while (k < 5) { group(k) = 'u' - '!'; k += 1 } // pad partial group
      var v = 0L
      group.foreach(g => v = v * 85 + g)
      val emit = chars - 1
      var shift = 24
      var j = 0
      while (j < emit) { out.write(((v >> shift) & 0xff).toInt); shift -= 8; j += 1 }
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        group(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      } // whitespace and stray bytes: skipped
      i += 1
    }
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** Length byte L: 0-127 copies the next L+1 bytes, 129-255 repeats
    * the next byte 257−L times, 128 is EOD (§7.4.5). */
  private def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val take = math.min(l + 1, data.length - i)
        out.write(data, i, take)
        i += take
      } else if (i < data.length) {
        val b = data(i); i += 1
        var k = 0
        while (k < 257 - l) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
    } catch { case _: java.util.zip.DataFormatException => () } // salvage prefix
    finally inf.end()
    out.toByteArray
  }
}
