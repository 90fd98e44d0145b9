package graft.pdf

import graft.html.SpanEmitter
import graft.model.Span

/** From-scratch PDF text + layout extractor (north_rule: "PDF/layout
  * parse" alongside the HTML boilerplate strip). JDK-only: FlateDecode
  * via `java.util.zip.Inflater`; no PDF library exists in this sandbox
  * and none is needed for the supported subset.
  *
  * Supported subset (each limit documented; PdfSpec pins the behavior):
  *  - object discovery is LENIENT and xref-free: every
  *    `<<dict>> stream…endstream` pair is examined, so damaged or
  *    truncated files still yield whatever streams survive (never-throw
  *    contract, same as the HTML tokenizer; PdfSpec fuzzes random bytes);
  *  - filters: `/FlateDecode` (zlib) or none — other filters skip the
  *    stream;
  *  - content-stream text operators: BT/ET blocks, `Tf` (size), `Td`/
  *    `TD`/`T*`/`Tm` (line moves → word separator), `Tj`/`'`/`"` and
  *    `TJ` arrays (shows), literal `(…)` strings with the full escape
  *    table (octal, \n\r\t\b\f, delimiters, line continuations) and
  *    hex `<…>` strings;
  *  - string bytes decode as UTF-8 (synth PDFs and the modern
  *    text-extraction case); font /Encoding & CMap indirection is out of
  *    scope — a real-corpus run would plug a cmap table into
  *    [[decodeString]];
  *  - `Do` placements are emitted as image spans in document order with
  *    `media_ref` = the XObject name (resource-dict indirection is not
  *    resolved — the NAME is the stable reference within the page).
  *
  * Layout heuristics (the PDF analogue of the HTML emitter's
  * tag/density scoring — PDFs have no semantic title element):
  *  - every BT..ET block with visible text becomes ONE text span in
  *    document order (blocks are the paragraph unit; intra-block line
  *    moves collapse to spaces);
  *  - the document TITLE is the text of the block set in the LARGEST
  *    font size (first such block on ties) — the standard
  *    largest-type-size heuristic.
  *
  * Output is the same [[SpanEmitter.Result]] the HTML paths produce, so
  * [[graft.extract.Extract.gate]] (language gate + title normalization)
  * is ONE code path for both formats.
  */
object PdfScanner {

  def extract(bytes: Array[Byte]): SpanEmitter.Result =
    try extractImpl(bytes)
    catch { case _: Throwable => SpanEmitter.Result(Array.empty[Span], "") } // never-throw backstop

  /** Maximum inflated bytes per stream — a zip-bomb guard; beyond it the
    * stream is truncated, not fatal.
    */
  val MaxInflated: Int = 16 * 1024 * 1024

  private sealed trait Event
  private final case class TextBlock(text: String, maxFont: Double) extends Event
  private final case class ImageRef(name: String) extends Event

  private def extractImpl(bytes: Array[Byte]): SpanEmitter.Result = {
    val n = bytes.length
    val events = new scala.collection.mutable.ArrayBuffer[Event]
    var i = 0
    while (i < n) {
      val sPos = indexOf(bytes, "stream", i)
      if (sPos < 0) { i = n }
      else {
        // data begins after the EOL that must follow the `stream` keyword
        var dataStart = sPos + 6
        if (dataStart < n && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < n && bytes(dataStart) == '\n') dataStart += 1
        val endPos = indexOf(bytes, "endstream", dataStart)
        // the stream's dict: walk BACKWARD balancing >>/<< so a nested
        // sub-dictionary (e.g. /DecodeParms << /Predictor 12 >>) doesn't
        // hide the outer dict's /Filter and /Length (the naive "last <<
        // before stream" would land inside the sub-dict)
        val dictStart = balancedDictStart(bytes, sPos)
        val dict =
          if (dictStart < 0) ""
          else new String(bytes, dictStart, sPos - dictStart, java.nio.charset.StandardCharsets.ISO_8859_1)
        // data bounds: a DIRECT /Length wins — binary stream bytes may
        // legitimately end in 0x0a/0x0d, which the EOL-trim fallback
        // (used for missing or indirect "/Length 4 0 R") would eat
        val dataEnd = directLength(dict) match {
          case Some(len) if len >= 0 && dataStart + len <= n => dataStart + len
          case _ =>
            var e = if (endPos < 0) n else endPos
            if (e > dataStart && bytes(e - 1) == '\n') e -= 1
            if (e > dataStart && bytes(e - 1) == '\r') e -= 1
            e
        }
        val hasOtherFilter =
          dict.contains("/Filter") && !dict.contains("/FlateDecode")
        if (!hasOtherFilter && dataEnd > dataStart) {
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val data = if (dict.contains("/FlateDecode")) inflate(raw) else raw
          if (data != null && looksLikeContent(data))
            parseContent(data, events)
        }
        i = if (endPos < 0) n else math.max(endPos + 9, dataEnd)
      }
    }
    // layout: title = first block in the largest font
    val texts = events.collect { case t: TextBlock => t }
    val title =
      if (texts.isEmpty) ""
      else texts.maxBy(_.maxFont).text // maxBy keeps the FIRST max
    val spans = new Array[Span](events.length)
    var o = 0
    events.foreach {
      case TextBlock(t, _) => spans(o) = Span("text", t, "", o); o += 1
      case ImageRef(name)  => spans(o) = Span("image", "", name, o); o += 1
    }
    SpanEmitter.Result(spans, title)
  }

  /** A decoded stream is treated as page content iff it carries a BT
    * text block or a Do placement TOKEN (delimited occurrence — an image
    * byte-blob that merely contains the letters "BT" stays opaque unless
    * they sit token-delimited, which the synth generator never produces).
    */
  private def looksLikeContent(data: Array[Byte]): Boolean =
    hasToken(data, "BT") || hasToken(data, "Do")

  /** Start index of the balanced `<< … >>` dict that CLOSES nearest
    * before `streamPos` (scanning backward, `>>` opens a level and `<<`
    * closes one). Returns the naive last-`<<` position when no closing
    * `>>` precedes the keyword (damaged input — stay lenient).
    */
  private[graft] def balancedDictStart(bytes: Array[Byte], streamPos: Int): Int = {
    val close = lastIndexOf(bytes, ">>", streamPos)
    if (close < 0) return lastIndexOf(bytes, "<<", streamPos)
    var depth = 1
    var i = close - 1
    while (i > 0 && depth > 0) {
      if (bytes(i - 1) == '<' && bytes(i) == '<') { depth -= 1; if (depth == 0) return i - 1; i -= 2 }
      else if (bytes(i - 1) == '>' && bytes(i) == '>') { depth += 1; i -= 2 }
      else i -= 1
    }
    if (depth > 0 && i == 0 && bytes.length > 1 && bytes(0) == '<' && bytes(1) == '<') 0
    else -1
  }

  /** Direct `/Length N` from a stream dict; None for an indirect
    * reference (`/Length 4 0 R`) or a missing/garbled entry.
    */
  private[graft] def directLength(dict: String): Option[Int] = {
    val at = dict.indexOf("/Length")
    if (at < 0) return None
    val tail = dict.substring(at + 7).dropWhile(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
    val digits = tail.takeWhile(_.isDigit)
    if (digits.isEmpty || digits.length > 9) return None
    val rest = tail.drop(digits.length).dropWhile(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
    // "<gen> R" after the number ⇒ indirect reference, not a length
    val gen = rest.takeWhile(_.isDigit)
    val afterGen = rest.drop(gen.length).dropWhile(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
    if (gen.nonEmpty && afterGen.startsWith("R")) None else Some(digits.toInt)
  }

  private def isDelim(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f' ||
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' || b == '/'

  private def hasToken(data: Array[Byte], tok: String): Boolean = {
    var from = 0
    while (true) {
      val p = indexOf(data, tok, from)
      if (p < 0) return false
      val beforeOk = p == 0 || isDelim(data(p - 1))
      val afterOk = p + tok.length >= data.length || isDelim(data(p + tok.length))
      if (beforeOk && afterOk) return true
      from = p + 1
    }
    false
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val last = hay.length - nb.length
    while (i <= last) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.min(before, hay.length) - nb.length
    while (i >= 0) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i -= 1
    }
    -1
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.min(raw.length * 4 + 64, MaxInflated))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && out.size() < MaxInflated) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return out.toByteArray // truncated/odd — keep what we have
        out.write(buf, 0, k)
      }
      out.toByteArray
    } catch {
      case _: Throwable => null // not zlib after all — skip the stream
    } finally inf.end()
  }

  // ---- content-stream interpreter -----------------------------------

  private def parseContent(d: Array[Byte], events: scala.collection.mutable.ArrayBuffer[Event]): Unit = {
    val n = d.length
    var i = 0
    var inText = false
    var fontSize = 0.0
    var blockMaxFont = 0.0
    val block = new java.lang.StringBuilder
    var lastNumber = 0.0
    var lastName = ""
    var lastString: Array[Byte] = null
    val arrStrings = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    var inArray = false

    def newline(): Unit =
      if (block.length() > 0 && block.charAt(block.length() - 1) != ' ') block.append(' ')

    def show(s: Array[Byte]): Unit = if (inText && s != null) {
      block.append(new String(s, java.nio.charset.StandardCharsets.UTF_8))
      if (fontSize > blockMaxFont) blockMaxFont = fontSize
    }

    def endBlock(): Unit = {
      if (inText) {
        val t = SpanEmitter.collapseWs(block.toString)
        if (t.nonEmpty) events += TextBlock(t, blockMaxFont)
      }
      inText = false; block.setLength(0); blockMaxFont = 0.0
    }

    def op(name: String): Unit = name match {
      case "BT" => endBlock(); inText = true
      case "ET" => endBlock()
      case "Tf" => fontSize = lastNumber
      case "Td" | "TD" | "T*" | "Tm" => newline()
      case "Tj" => show(lastString)
      case "'"  => newline(); show(lastString)
      case "\"" => newline(); show(lastString)
      case "TJ" => arrStrings.foreach(show); arrStrings.clear()
      case "Do" => if (lastName.nonEmpty) events += ImageRef(lastName)
      case _    => () // every other operator is layout/color/path noise here
    }

    while (i < n) {
      val b = d(i)
      if (b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f') i += 1
      else if (b == '%') { while (i < n && d(i) != '\n' && d(i) != '\r') i += 1 } // comment
      else if (b == '(') { // literal string
        val (s, next) = literalString(d, i)
        lastString = s; if (inArray) arrStrings += s; i = next
      } else if (b == '<' && i + 1 < n && d(i + 1) == '<') { // inline dict — skip balanced
        var depth = 0
        var done = false
        while (i < n && !done) {
          if (i + 1 < n && d(i) == '<' && d(i + 1) == '<') { depth += 1; i += 2 }
          else if (i + 1 < n && d(i) == '>' && d(i + 1) == '>') {
            depth -= 1; i += 2; if (depth <= 0) done = true
          } else i += 1
        }
      } else if (b == '<') { // hex string
        val (s, next) = hexString(d, i)
        lastString = s; if (inArray) arrStrings += s; i = next
      } else if (b == '[') { inArray = true; arrStrings.clear(); i += 1 }
      else if (b == ']') { inArray = false; i += 1 }
      else if (b == '/') { // name
        val start = i + 1
        var j = start
        while (j < n && !isDelim(d(j))) j += 1
        lastName = new String(d, start, j - start, java.nio.charset.StandardCharsets.ISO_8859_1)
        i = j
      } else if ((b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.') { // number
        val start = i
        var j = i + 1
        while (j < n && ((d(j) >= '0' && d(j) <= '9') || d(j) == '.' || d(j) == '-' || d(j) == '+')) j += 1
        val s = new String(d, start, j - start, java.nio.charset.StandardCharsets.ISO_8859_1)
        try lastNumber = s.toDouble catch { case _: Throwable => () }
        i = j
      } else { // operator token
        val start = i
        var j = i
        while (j < n && !isDelim(d(j)) && d(j) != '%') j += 1
        if (j == start) j += 1 // lone delimiter-ish byte — consume it
        op(new String(d, start, j - start, java.nio.charset.StandardCharsets.ISO_8859_1))
        i = j
      }
    }
    endBlock()
  }

  /** Literal `(…)` string: nesting, the PDF escape table, octal codes,
    * escaped-EOL continuations. Returns (decoded bytes, index after `)`).
    */
  private[graft] def literalString(d: Array[Byte], open: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = open + 1
    var depth = 1
    val n = d.length
    while (i < n && depth > 0) {
      val b = d(i)
      if (b == '\\' && i + 1 < n) {
        val e = d(i + 1)
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\r' => i += 2; if (i < n && d(i) == '\n') i += 1 // line continuation
          case '\n' => i += 2
          case o if o >= '0' && o <= '7' => // 1-3 octal digits
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && d(i) >= '0' && d(i) <= '7') { v = v * 8 + (d(i) - '0'); i += 1; k += 1 }
            out.write(v & 0xff)
          case other => out.write(other); i += 2 // unknown escape: the char itself
        }
      } else if (b == '(') { depth += 1; out.write('('); i += 1 }
      else if (b == ')') { depth -= 1; if (depth > 0) out.write(')'); i += 1 }
      else { out.write(b); i += 1 }
    }
    (out.toByteArray, i)
  }

  /** Hex `<…>` string: pairs of hex digits, whitespace ignored, odd tail
    * padded with 0. Returns (decoded bytes, index after `>`).
    */
  private[graft] def hexString(d: Array[Byte], open: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = open + 1
    val n = d.length
    var hi = -1
    while (i < n && d(i) != '>') {
      val c = d(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd digit count: pad low nibble with 0
    (out.toByteArray, if (i < n) i + 1 else i)
  }
}
