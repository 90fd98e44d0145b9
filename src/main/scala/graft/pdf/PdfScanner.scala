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
  *  - string bytes decode per the font selected by `Tf`: a font with a
  *    `/ToUnicode` CMap stream (`beginbfchar`/`beginbfrange`, scalar and
  *    array ranges, 1- or 2-byte codes) decodes through the CMap; else
  *    `/Encoding /WinAnsiEncoding` (= windows-1252) or
  *    `/MacRomanEncoding` byte tables; else UTF-8 (the synth default).
  *    Font discovery is a lenient object pre-pass: `N G obj << … >>`
  *    headers are scanned for `/Type /Font` dicts and `/Font << /Fx N 0
  *    R >>` resource groups — name→font mapping is file-global
  *    (last-wins), not per-page. Dict-form `/Encoding << /BaseEncoding
  *    /X /Differences [ n /glyph … ] >>` builds a byte table with
  *    per-code glyph overrides (common AGL names + `uniXXXX`; unknown
  *    names → U+FFFD; missing BaseEncoding defaults to WinAnsi — the
  *    font program's built-in encoding is unresolvable without the font
  *    itself). Type0 composite fonts with `/Encoding /Identity-H` (or
  *    -V) decode their 2-byte codes through the font's `/ToUnicode`
  *    CMap (the dominant real-world shape for non-Latin and subsetted
  *    fonts); descendant CIDFont dicts pass through untouched (the
  *    ToUnicode lives on the Type0 dict). Identity-H WITHOUT a
  *    ToUnicode yields one U+FFFD per 2-byte code — the CIDs are glyph
  *    ids, unmappable without the font program. PDF 1.5 object streams
  *    (`/Type /ObjStm`) are EXPANDED: their packed dict objects (the
  *    route by which modern writers hide font/encoding dicts from a raw
  *    byte scan) feed the same pre-pass — CMap streams themselves stay
  *    top-level by spec. Stream-form `/Encoding N 0 R` (an indirect
  *    reference to an embedded CMap stream) is RESOLVED through the
  *    same pre-pass: the referenced CMap's codespacerange fixes the
  *    code width (a 2-byte code space without a ToUnicode decodes one
  *    U+FFFD per code instead of per-byte mojibake — CIDs are glyph
  *    ids, unmappable without the font program), bf mappings found
  *    there are honored leniently, and a `/ToUnicode` still wins.
  *    Indirect `/Length N 0 R` stream lengths resolve through a lazy
  *    integer-object scan (stream BYTES may legitimately contain the
  *    `endstream` token, which would truncate the EOL-scan fallback).
  *    Named predefined CMaps (`/UniGB-UCS2-H` …) stay out of scope;
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

  // ---- per-font string decoders -------------------------------------

  private[graft] sealed trait Decoder
  private[graft] case object Utf8Dec extends Decoder
  private[graft] case object WinAnsiDec extends Decoder
  private[graft] case object MacRomanDec extends Decoder
  private[graft] final case class CMapDec(codeLen: Int,
      map: java.util.HashMap[Integer, String]) extends Decoder
  /** Byte→string table built from a base encoding + /Differences. */
  private[graft] final case class ByteTableDec(table: Array[String]) extends Decoder
  /** Type0 `/Encoding /Identity-H` (or -V) WITHOUT a usable /ToUnicode:
    * each 2-byte code is a CID = glyph id, and without the font program
    * there is no code→text mapping — iterate the 2-byte codes and emit
    * one replacement char each (never silence, same contract as unmapped
    * CMap codes). With a /ToUnicode stream present the [[CMapDec]] built
    * from it replaces this base decoder.
    */
  private[graft] case object Identity2Dec extends Decoder

  // WinAnsiEncoding is windows-1252 (java.base); MacRomanEncoding lives
  // in the jdk.charsets module — present in a full JDK, so fall back to
  // ISO-8859-1 only on stripped runtimes (documented best-effort)
  private val winAnsiCs = java.nio.charset.Charset.forName("windows-1252")
  private val macRomanCs =
    try java.nio.charset.Charset.forName("x-MacRoman")
    catch { case _: Throwable => java.nio.charset.StandardCharsets.ISO_8859_1 }

  private[graft] def decodeString(s: Array[Byte], dec: Decoder): String = dec match {
    case Utf8Dec     => new String(s, java.nio.charset.StandardCharsets.UTF_8)
    case WinAnsiDec  => new String(s, winAnsiCs)
    case MacRomanDec => new String(s, macRomanCs)
    case ByteTableDec(table) =>
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) { sb.append(table(s(i) & 0xff)); i += 1 }
      sb.toString
    case Identity2Dec =>
      val sb = new java.lang.StringBuilder(s.length / 2 + 1)
      var i = 0
      while (i + 2 <= s.length) { sb.append('�'); i += 2 }
      sb.toString // a trailing partial code is dropped
    case CMapDec(len, m) =>
      val sb = new java.lang.StringBuilder(s.length / len + 1)
      var i = 0
      while (i + len <= s.length) {
        var code = 0
        var k = 0
        while (k < len) { code = (code << 8) | (s(i + k) & 0xff); k += 1 }
        val t = m.get(code)
        sb.append(if (t != null) t else "�") // unmapped code
        i += len
      }
      sb.toString // a trailing partial code is dropped
  }

  /** Decoded per-stream payloads in document order: (owning object
    * number, stream dict text, decoded data). Object number is -1 when
    * the stream has no parseable `N G obj` header — damaged input stays
    * usable as anonymous content.
    */
  private val IndirectLenRe = """/Length\s+(\d{1,9})\s+\d+\s+R""".r

  private def decodeStreams(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Int, String, Array[Byte])] = {
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[(Int, String, Array[Byte])]
    // integer objects (`12 0 obj 345 endobj`) resolve indirect /Length
    // refs; built lazily — most files carry only direct lengths. A
    // resolved length is trusted only when the bytes it points at are
    // actually followed by the `endstream` close (after optional EOL/ws):
    // the scan sees EVERY `N G obj <int> endobj` in the file, including
    // impostors inside raw stream payloads, and writers legally emit the
    // real length object on EITHER side of the stream (this synth puts it
    // after, "when the length becomes known") — so neither first- nor
    // last-binding order is safe; only the binding the stream itself
    // corroborates is.
    var intObjs: java.util.HashMap[Integer, java.util.ArrayList[Integer]] = null
    def endstreamAt(k0: Int): Boolean = {
      var k = k0
      while (k < n && (bytes(k) == ' ' || bytes(k) == '\r' || bytes(k) == '\n' ||
        bytes(k) == '\t' || bytes(k) == 0 || bytes(k) == '\f')) k += 1
      k + 9 <= n && bytes(k) == 'e' && bytes(k + 1) == 'n' && bytes(k + 2) == 'd' &&
        bytes(k + 3) == 's' && bytes(k + 4) == 't' && bytes(k + 5) == 'r' &&
        bytes(k + 6) == 'e' && bytes(k + 7) == 'a' && bytes(k + 8) == 'm'
    }
    def indirectLength(dict: String, dataStart: Int): Option[Int] =
      IndirectLenRe.findFirstMatchIn(dict).flatMap { m =>
        if (intObjs == null) intObjs = scanIntObjects(bytes)
        val cands = intObjs.get(Integer.valueOf(m.group(1).toInt))
        if (cands == null) None
        else {
          var pick = -1
          var ci = 0
          while (pick < 0 && ci < cands.size()) {
            val len = cands.get(ci).intValue
            if (dataStart.toLong + len <= n && endstreamAt(dataStart + len)) pick = len
            ci += 1
          }
          if (pick >= 0) Some(pick) else None
        }
      }
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
        // data bounds: a /Length wins, DIRECT or resolved-indirect —
        // stream bytes may legitimately end in 0x0a/0x0d (eaten by the
        // EOL-trim fallback) or even contain the `endstream` token
        // itself (truncating the fallback mid-stream)
        val dataEnd = directLength(dict).orElse(indirectLength(dict, dataStart)) match {
          case Some(len) if len >= 0 && dataStart.toLong + len <= n => dataStart + len
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
          if (data != null)
            out += ((objNumBefore(bytes, if (dictStart >= 0) dictStart else sPos), dict, data))
        }
        // resume past the endstream that CLOSES this stream: when a
        // length-resolved stream's bytes contain the token, `endPos` is
        // the in-data impostor — the real close is at/after dataEnd
        val resumeEnd =
          if (endPos >= 0 && endPos < dataEnd) indexOf(bytes, "endstream", dataEnd)
          else endPos
        i = if (resumeEnd < 0) n else math.max(resumeEnd + 9, dataEnd)
      }
    }
    out
  }

  /** All integer objects (`N G obj 345 endobj`) — the layout of indirect
    * `/Length` targets. Same lenient token-delimited `obj` walk as
    * [[scanObjectDicts]]; only token-clean `int … endobj` bodies qualify.
    * EVERY binding is kept in scan order (a raw stream payload can embed
    * an impostor with the real target's object number on either side of
    * the real one — the resolver picks the binding whose length the
    * stream's own `endstream` close corroborates, so order is evidence,
    * not authority).
    */
  private[graft] def scanIntObjects(bytes: Array[Byte]): java.util.HashMap[Integer, java.util.ArrayList[Integer]] = {
    val out = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
    val n = bytes.length
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\r' || b == '\n' || b == '\t' || b == 0 || b == '\f'
    var from = 0
    while (from < n) {
      val p = indexOf(bytes, "obj", from)
      if (p < 0) return out
      val beforeOk = p == 0 || isDelim(bytes(p - 1))
      val afterOk = p + 3 >= n || isDelim(bytes(p + 3))
      if (beforeOk && afterOk) {
        val num = objNumBefore(bytes, p + 3)
        var j = p + 3
        while (j < n && isWs(bytes(j))) j += 1
        if (num >= 0 && j < n && bytes(j) >= '0' && bytes(j) <= '9') {
          var v = 0L
          var digits = 0
          while (j < n && bytes(j) >= '0' && bytes(j) <= '9' && digits < 10) {
            v = v * 10 + (bytes(j) - '0'); j += 1; digits += 1
          }
          var k = j
          while (k < n && isWs(bytes(k))) k += 1
          val endobjOk = k + 6 <= n && bytes(k) == 'e' && bytes(k + 1) == 'n' &&
            bytes(k + 2) == 'd' && bytes(k + 3) == 'o' && bytes(k + 4) == 'b' &&
            bytes(k + 5) == 'j'
          if (digits <= 9 && endobjOk && v <= Int.MaxValue) {
            var lst = out.get(num)
            if (lst == null) { lst = new java.util.ArrayList[Integer](1); out.put(num, lst) }
            lst.add(Integer.valueOf(v.toInt))
          }
        }
      }
      from = p + 3
    }
    out
  }

  /** /N and /First from an ObjStm dict; None when either is missing or
    * implausible (N capped at 10k — bomb guard).
    */
  private val ObjStmNRe = """/N\s+(\d{1,5})""".r
  private val ObjStmFirstRe = """/First\s+(\d{1,9})""".r

  /** Expand a PDF 1.5 object stream (`/Type /ObjStm`): the decoded data
    * opens with N (objnum, offset) integer pairs, then the concatenated
    * object bodies starting at /First (offsets relative to it). Only
    * DICT objects are harvested — the spec forbids streams inside an
    * ObjStm, so this is exactly the route by which font/encoding dicts
    * hide from the raw `N G obj` scan in modern PDFs. Lenient: any
    * malformed header/offset yields what parsed so far.
    */
  private[graft] def parseObjStm(dict: String, data: Array[Byte]): Seq[(Int, String)] = {
    val n = ObjStmNRe.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(return Nil)
    val first = ObjStmFirstRe.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(return Nil)
    if (n <= 0 || n > 10000 || first <= 0 || first > data.length) return Nil
    // header: 2·N whitespace-separated integers within data[0, first)
    val ints = new scala.collection.mutable.ArrayBuffer[Int](2 * n)
    var i = 0
    while (i < first && ints.length < 2 * n) {
      while (i < first && !(data(i) >= '0' && data(i) <= '9')) i += 1
      if (i < first) {
        var v = 0L
        while (i < first && data(i) >= '0' && data(i) <= '9' && v <= Int.MaxValue) {
          v = v * 10 + (data(i) - '0'); i += 1
        }
        // consume the rest of an oversized digit run: one hostile huge
        // number must stay ONE header entry, not split into two and
        // misalign every later (objnum, offset) pair (ADVICE r5)
        while (i < first && data(i) >= '0' && data(i) <= '9') i += 1
        ints += math.min(v, Int.MaxValue).toInt
      }
    }
    // each object's slice is bounded by the NEXT object's offset (the
    // header already provides it) — decoding to end-of-stream per object
    // was O(N·dataLen) transient copies on the per-document hot path
    val offsets: Array[Int] = (1 until ints.length by 2).map(ints).sorted.toArray
    // first offset strictly greater than `off`, by binary search (a
    // linear find over the sorted array re-introduced O(N²) at /N=10k)
    def nextOffsetAfter(off: Int): Int = {
      var idx = java.util.Arrays.binarySearch(offsets, off)
      if (idx < 0) idx = -idx - 1
      else { while (idx < offsets.length && offsets(idx) == off) idx += 1 }
      if (idx < offsets.length) offsets(idx) else Int.MaxValue
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Int, String)]
    var k = 0
    while (k + 1 < ints.length) {
      val objNum = ints(k)
      val off = ints(k + 1)
      val start = first.toLong + off
      if (start < data.length) {
        val bound =
          math.min(first.toLong + nextOffsetAfter(off), data.length.toLong).toInt
        var s = start.toInt
        while (s < bound && (data(s) == ' ' || data(s) == '\r' || data(s) == '\n' || data(s) == '\t')) s += 1
        if (s + 1 < bound && data(s) == '<' && data(s + 1) == '<') {
          val text = new String(data, s, bound - s, java.nio.charset.StandardCharsets.ISO_8859_1)
          out += ((objNum, text.substring(0, balancedDictEnd(text, 0))))
        }
      }
      k += 2
    }
    out.toSeq
  }

  private def extractImpl(bytes: Array[Byte]): SpanEmitter.Result = {
    // streams first: object streams (/Type /ObjStm) may carry the very
    // font dicts the encoding pre-pass needs — modern (PDF 1.5+) writers
    // pack non-stream objects there, invisible to the raw `N G obj` scan
    val streams = decodeStreams(bytes)
    val objDicts = scanObjectDicts(bytes) ++ streams.flatMap {
      case (_, dict, data) =>
        if (dict.contains("/ObjStm")) parseObjStm(dict, data) else Nil
    }

    // encoding pre-pass: object dicts → font resources + per-font decoder
    val fontNameToObj = new java.util.HashMap[String, Integer]()
    // obj → (base decoder, /ToUnicode obj or -1, stream-form /Encoding obj or -1)
    val fontEnc = new java.util.HashMap[Integer, (Decoder, Int, Int)]()
    val toUniObjs = new java.util.HashSet[Integer]()
    val encRefObjs = new java.util.HashSet[Integer]()
    objDicts.foreach { case (num, d) =>
      fontResourceRefs(d).foreach { case (name, obj) => fontNameToObj.put(name, obj) }
      if (FontTypeRe.findFirstIn(d).isDefined) {
        val toUni = ToUnicodeRe.findFirstMatchIn(d).map(_.group(1).toInt).getOrElse(-1)
        val encRef = EncodingRefRe.findFirstMatchIn(d).map(_.group(1).toInt).getOrElse(-1)
        fontEnc.put(num, (encodingDecoder(d), toUni, encRef))
        if (toUni >= 0) toUniObjs.add(toUni)
        if (encRef >= 0) encRefObjs.add(encRef)
      }
    }

    // stream pass: CMap streams feed font decoders, the rest is content
    // (ObjStm payloads are object storage, never page content)
    val cmapByObj = new java.util.HashMap[Integer, CMapDec]()
    val encCMapByObj = new java.util.HashMap[Integer, CMapDec]()
    val contentStreams = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    streams.foreach { case (objNum, dict, data) =>
      if (objNum >= 0 && toUniObjs.contains(objNum) &&
          (hasToken(data, "beginbfchar") || hasToken(data, "beginbfrange")))
        cmapByObj.put(objNum, parseCMap(data))
      else if (objNum >= 0 && encRefObjs.contains(objNum) &&
          (hasToken(data, "begincodespacerange") ||
            hasToken(data, "beginbfchar") || hasToken(data, "beginbfrange")))
        encCMapByObj.put(objNum, parseCMap(data))
      else if (!dict.contains("/ObjStm") && looksLikeContent(data)) contentStreams += data
    }
    val fontMap = new java.util.HashMap[String, Decoder]()
    fontNameToObj.forEach { (name, obj) =>
      val info = fontEnc.get(obj)
      if (info != null) {
        val (baseDec, toUni, encRef) = info
        val dec =
          if (toUni >= 0 && cmapByObj.containsKey(toUni)) cmapByObj.get(toUni)
          else if (encRef >= 0 && encCMapByObj.containsKey(encRef)) {
            // a stream-form /Encoding CMap maps codes → CIDs, not to
            // text: without a ToUnicode its usable information is the
            // CODE WIDTH from its codespacerange (2-byte codes decode
            // one U+FFFD per code, never per-byte mojibake — CIDs are
            // glyph ids, unmappable without the font program). Writers
            // that put bf mappings here get them honored leniently.
            val ec = encCMapByObj.get(encRef)
            if (!ec.map.isEmpty) ec
            else if (ec.codeLen == 2) Identity2Dec
            else baseDec
          } else baseDec
        fontMap.put(name, dec)
      }
    }

    val events = new scala.collection.mutable.ArrayBuffer[Event]
    contentStreams.foreach(parseContent(_, events, fontMap))

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

  private val FontTypeRe = """/Type\s*/Font""".r
  private val EncodingRe = """/Encoding\s*/([\w-]+)""".r // hyphen: Identity-H / Identity-V
  private val EncodingRefRe = """/Encoding\s+(\d{1,9})\s+\d+\s+R""".r // stream-form indirect ref
  private val ToUnicodeRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val FontRefRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r
  private val BaseEncodingRe = """/BaseEncoding\s*/(\w+)""".r
  private val DiffTokenRe = """/([^\s/\[\]<>()]+)|(\d+)""".r

  /** Common Adobe-Glyph-List names (the subset a Differences array in a
    * Latin-text PDF actually uses) — plus `uniXXXX` names, handled in
    * [[glyphToChar]]. Unknown names decode to U+FFFD, never silence.
    */
  private val glyphNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    def p(n: String, c: String): Unit = m.put(n, c)
    // punctuation / symbols
    p("space", " "); p("exclam", "!"); p("quotedbl", "\""); p("numbersign", "#")
    p("dollar", "$"); p("percent", "%"); p("ampersand", "&"); p("quotesingle", "'")
    p("parenleft", "("); p("parenright", ")"); p("asterisk", "*"); p("plus", "+")
    p("comma", ","); p("hyphen", "-"); p("period", "."); p("slash", "/")
    p("colon", ":"); p("semicolon", ";"); p("less", "<"); p("equal", "=")
    p("greater", ">"); p("question", "?"); p("at", "@"); p("bracketleft", "[")
    p("backslash", "\\"); p("bracketright", "]"); p("underscore", "_")
    p("braceleft", "{"); p("bar", "|"); p("braceright", "}")
    p("Euro", "€"); p("emdash", "—"); p("endash", "–"); p("bullet", "•")
    p("quotedblleft", "“"); p("quotedblright", "”")
    p("quoteleft", "‘"); p("quoteright", "’"); p("ellipsis", "…")
    p("trademark", "™"); p("copyright", "©"); p("registered", "®")
    p("degree", "°"); p("section", "§"); p("paragraph", "¶"); p("dagger", "†")
    // digits
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) => p(n, i.toString) }
    // accented Latin (both cases where common)
    p("agrave", "à"); p("aacute", "á"); p("acircumflex", "â"); p("adieresis", "ä")
    p("egrave", "è"); p("eacute", "é"); p("ecircumflex", "ê"); p("edieresis", "ë")
    p("igrave", "ì"); p("iacute", "í"); p("idieresis", "ï")
    p("ograve", "ò"); p("oacute", "ó"); p("ocircumflex", "ô"); p("odieresis", "ö")
    p("ugrave", "ù"); p("uacute", "ú"); p("ucircumflex", "û"); p("udieresis", "ü")
    p("ccedilla", "ç"); p("ntilde", "ñ"); p("aring", "å"); p("oslash", "ø")
    p("ae", "æ"); p("germandbls", "ß"); p("ydieresis", "ÿ")
    p("Agrave", "À"); p("Aacute", "Á"); p("Adieresis", "Ä"); p("Eacute", "É")
    p("Odieresis", "Ö"); p("Udieresis", "Ü"); p("Ccedilla", "Ç"); p("Ntilde", "Ñ")
    m
  }

  /** Glyph name → text: single-char AGL names map to themselves,
    * `uniXXXX` names decode their hex, the common-name table covers the
    * rest; unknown → U+FFFD.
    */
  private[graft] def glyphToChar(name: String): String =
    if (name.length == 1) name
    else if (name.length >= 7 && name.startsWith("uni")) {
      try String.valueOf(Integer.parseInt(name.substring(3, 7), 16).toChar)
      catch { case _: Throwable => "�" }
    } else {
      val v = glyphNames.get(name)
      if (v != null) v else "�"
    }

  private def byteTable(cs: java.nio.charset.Charset): Array[String] =
    Array.tabulate(256)(i => new String(Array(i.toByte), cs))

  /** The font's `/Encoding` entry → base (non-CMap) decoder:
    *  - `/Encoding /WinAnsiEncoding` (or MacRoman) → byte table;
    *  - `/Encoding << /BaseEncoding /X /Differences [ n /glyph … ] >>` →
    *    base table with per-code glyph overrides (an integer resets the
    *    code, each name assigns code++ — PDF 32000 §9.6.6); missing
    *    BaseEncoding defaults to WinAnsi (documented subset: the font's
    *    built-in encoding is not resolvable without the font program);
    *  - absent/other → UTF-8 (the synth default).
    */
  private[graft] def encodingDecoder(dict: String): Decoder = {
    val at = dict.indexOf("/Encoding")
    if (at < 0) return Utf8Dec
    var i = at + 9
    while (i < dict.length && (dict(i) == ' ' || dict(i) == '\r' || dict(i) == '\n' || dict(i) == '\t')) i += 1
    if (i < dict.length && dict(i) == '/') {
      EncodingRe.findFirstMatchIn(dict.substring(at)).map(_.group(1)).getOrElse("") match {
        case "WinAnsiEncoding"  => WinAnsiDec
        case "MacRomanEncoding" => MacRomanDec
        // Type0 composite fonts (VERDICT r4 item 2): Identity-H/-V maps
        // 2-byte codes straight to CIDs — the base decoder iterates
        // 2-byte codes; a /ToUnicode CMap (the standard companion and
        // the only text route without the font program) overrides it in
        // extractImpl. Named non-Identity CMaps (/UniGB-UCS2-H …) and
        // stream-form /Encoding N 0 R remain out of scope.
        case "Identity-H" | "Identity-V" => Identity2Dec
        case _                  => Utf8Dec
      }
    } else if (i + 1 < dict.length && dict(i) == '<' && dict(i + 1) == '<') {
      val sub = dict.substring(i, balancedDictEnd(dict, i)) // balanced sub-dict
      val cs = BaseEncodingRe.findFirstMatchIn(sub).map(_.group(1)) match {
        case Some("MacRomanEncoding") => macRomanCs
        case _                        => winAnsiCs // incl. explicit WinAnsi and the default
      }
      val table = byteTable(cs)
      val diffAt = sub.indexOf("/Differences")
      if (diffAt >= 0) {
        val open = sub.indexOf('[', diffAt)
        val close = if (open < 0) -1 else sub.indexOf(']', open)
        if (open >= 0 && close > open) {
          var code = 0
          DiffTokenRe.findAllMatchIn(sub.substring(open + 1, close)).foreach { mm =>
            if (mm.group(2) != null) { // integer: reset current code
              try code = mm.group(2).toInt catch { case _: Throwable => () }
            } else if (code >= 0 && code < 256) { // glyph name: assign code++
              table(code) = glyphToChar(mm.group(1))
              code += 1
            }
          }
        }
      }
      ByteTableDec(table)
    } else Utf8Dec
  }

  /** `(name → object number)` pairs from a dict's `/Font << … >>`
    * resource group, if any.
    */
  /** End index (exclusive) of the balanced `<< … >>` starting at `open`
    * in `s`, or s.length when unterminated (lenient).
    */
  private def balancedDictEnd(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i + 1 < s.length) {
      if (s(i) == '<' && s(i + 1) == '<') { depth += 1; i += 2 }
      else if (s(i) == '>' && s(i + 1) == '>') {
        depth -= 1; i += 2; if (depth == 0) return i
      } else i += 1
    }
    s.length
  }

  /** Anchored on the name token `/Font` DIRECTLY followed by `<<` — a bare
    * `indexOf("/Font")` also matched the "/Font" inside a font object's own
    * `/Type /Font`, harvesting whatever nested dict came next (e.g. a
    * dict-form /Encoding) into the file-global font-name map (ADVICE r4).
    */
  private val FontGroupRe = """/Font\s*<<""".r

  private[graft] def fontResourceRefs(dict: String): Seq[(String, Int)] = {
    FontGroupRe.findFirstMatchIn(dict) match {
      case None => Nil
      case Some(m) =>
        val open = m.end - 2 // the `<<` the regex just matched
        FontRefRe.findAllMatchIn(dict.substring(open, balancedDictEnd(dict, open)))
          .map(mm => mm.group(1) -> mm.group(2).toInt).toSeq
    }
  }

  /** All `N G obj << … >>` definitions: (object number, dict text).
    * Token-delimited `obj` scan (so `endobj` never matches), forward
    * balanced dict parse — lenient: malformed headers are skipped, the
    * never-throw contract holds.
    */
  private[graft] def scanObjectDicts(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Int, String)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Int, String)]
    val n = bytes.length
    var from = 0
    while (from < n) {
      val p = indexOf(bytes, "obj", from)
      if (p < 0) return out
      val beforeOk = p == 0 || isDelim(bytes(p - 1))
      val afterOk = p + 3 >= n || isDelim(bytes(p + 3))
      if (beforeOk && afterOk) {
        val num = objNumBefore(bytes, p + 3) // pos just past the keyword
        var j = p + 3
        while (j < n && (bytes(j) == ' ' || bytes(j) == '\r' || bytes(j) == '\n' || bytes(j) == '\t')) j += 1
        if (num >= 0 && j + 1 < n && bytes(j) == '<' && bytes(j + 1) == '<') {
          var depth = 0
          var i = j
          var end = -1
          while (i + 1 < n && end < 0) {
            if (bytes(i) == '<' && bytes(i + 1) == '<') { depth += 1; i += 2 }
            else if (bytes(i) == '>' && bytes(i + 1) == '>') {
              depth -= 1; i += 2; if (depth == 0) end = i
            } else i += 1
          }
          if (end > j)
            out += ((num, new String(bytes, j, end - j, java.nio.charset.StandardCharsets.ISO_8859_1)))
        }
      }
      from = p + 3
    }
    out
  }

  /** Object number of the `N G obj` header whose dict/stream begins at
    * `pos` (scanning backward over `obj`, generation, number); -1 when no
    * well-formed header precedes it.
    */
  private[graft] def objNumBefore(bytes: Array[Byte], pos: Int): Int = {
    var i = pos - 1
    def skipWs(): Unit =
      while (i >= 0 && (bytes(i) == ' ' || bytes(i) == '\r' || bytes(i) == '\n' || bytes(i) == '\t')) i -= 1
    skipWs()
    // "obj"
    if (i < 2 || bytes(i) != 'j' || bytes(i - 1) != 'b' || bytes(i - 2) != 'o') return -1
    i -= 3
    skipWs()
    // generation digits
    val genEnd = i
    while (i >= 0 && bytes(i) >= '0' && bytes(i) <= '9') i -= 1
    if (i == genEnd) return -1
    skipWs()
    // object number digits
    val numEnd = i
    var num = 0L
    var mul = 1L
    while (i >= 0 && bytes(i) >= '0' && bytes(i) <= '9' && mul <= 1000000000L) {
      num += (bytes(i) - '0') * mul; mul *= 10; i -= 1
    }
    if (i == numEnd || num > Int.MaxValue) -1 else num.toInt
  }

  /** Parse a `/ToUnicode` (or embedded `/Encoding`) CMap stream:
    * `beginbfchar` pairs and `beginbfrange` triples (scalar `<lo> <hi>
    * <dstStart>` — dst's last UTF-16 unit increments across the range —
    * and array `<lo> <hi> [<d0> <d1> …]` forms). Code width (1 or 2
    * bytes) comes from the first `codespacerange` operand, else the
    * first bf src operand (an embedded /Encoding CMap carries cid
    * mappings, not bf — its codespacerange is the usable signal);
    * expansion is capped at 65536 mappings (bomb guard). Dst hex
    * decodes as UTF-16BE (multi-unit targets allowed).
    */
  private[graft] def parseCMap(data: Array[Byte]): CMapDec = {
    val map = new java.util.HashMap[Integer, String]()
    var codeLen = 0
    val n = data.length
    var i = 0
    var mode = 0 // 0 outside, 1 bfchar, 2 bfrange, 3 codespacerange
    val ops = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    var arr: scala.collection.mutable.ArrayBuffer[Array[Byte]] = null
    val MaxMappings = 65536

    def hexVal(b: Array[Byte]): Int = {
      var v = 0
      var k = 0
      while (k < b.length && k < 4) { v = (v << 8) | (b(k) & 0xff); k += 1 }
      v
    }
    def dstStr(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    def noteCodeLen(src: Array[Byte]): Unit =
      if (codeLen == 0 && src.nonEmpty) codeLen = math.min(src.length, 2)
    def put(code: Int, s: String): Unit =
      if (map.size < MaxMappings) map.put(code, s)

    def onHex(s: Array[Byte]): Unit = {
      if (arr != null) { arr += s; return }
      mode match {
        case 3 => noteCodeLen(s) // codespace bound fixes the code width
        case 1 =>
          ops += s
          if (ops.length == 2) {
            noteCodeLen(ops(0))
            put(hexVal(ops(0)), dstStr(ops(1)))
            ops.clear()
          }
        case 2 =>
          ops += s
          if (ops.length == 3) {
            noteCodeLen(ops(0))
            val lo = hexVal(ops(0)); val hi = hexVal(ops(1))
            val base = dstStr(ops(2))
            var c = lo
            while (c <= hi && c - lo < MaxMappings && base.nonEmpty) {
              put(c, base.substring(0, base.length - 1) +
                (base.charAt(base.length - 1) + (c - lo)).toChar)
              c += 1
            }
            ops.clear()
          }
        case _ => ()
      }
    }

    while (i < n) {
      val b = data(i)
      if (b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f') i += 1
      else if (b == '%') { while (i < n && data(i) != '\n' && data(i) != '\r') i += 1 }
      else if (b == '<' && !(i + 1 < n && data(i + 1) == '<')) {
        val (s, nx) = hexString(data, i)
        onHex(s); i = nx
      } else if (b == '[') { arr = new scala.collection.mutable.ArrayBuffer; i += 1 }
      else if (b == ']') {
        if (arr != null && mode == 2 && ops.length == 2) {
          noteCodeLen(ops(0))
          val lo = hexVal(ops(0))
          arr.zipWithIndex.foreach { case (d, k) => put(lo + k, dstStr(d)) }
          ops.clear()
        }
        arr = null; i += 1
      } else {
        val start = i
        var j = i
        while (j < n && !isDelim(data(j)) && data(j) != '%') j += 1
        if (j == start) j += 1
        new String(data, start, j - start, java.nio.charset.StandardCharsets.ISO_8859_1) match {
          case "beginbfchar"  => mode = 1; ops.clear()
          case "endbfchar"    => mode = 0; ops.clear()
          case "beginbfrange" => mode = 2; ops.clear()
          case "endbfrange"   => mode = 0; ops.clear()
          case "begincodespacerange" => mode = 3; ops.clear()
          case "endcodespacerange"   => mode = 0; ops.clear()
          case _              => () // cid sections, names, numbers — noise here
        }
        i = j
      }
    }
    CMapDec(if (codeLen == 0) 1 else codeLen, map)
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

  private def parseContent(d: Array[Byte], events: scala.collection.mutable.ArrayBuffer[Event],
                           fontMap: java.util.HashMap[String, Decoder]): Unit = {
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
    var curDec: Decoder = Utf8Dec // until a Tf selects a known font

    def newline(): Unit =
      if (block.length() > 0 && block.charAt(block.length() - 1) != ' ') block.append(' ')

    def show(s: Array[Byte]): Unit = if (inText && s != null) {
      block.append(decodeString(s, curDec))
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
      case "Tf" =>
        fontSize = lastNumber
        val dec = fontMap.get(lastName) // /Fx SIZE Tf — lastName is the font
        curDec = if (dec != null) dec else Utf8Dec
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
