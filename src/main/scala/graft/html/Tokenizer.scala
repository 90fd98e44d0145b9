package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML token stream. The tokenizer is a from-scratch, allocation-light,
  * never-throw state machine (HTML5-inspired, not spec-complete): it must
  * survive arbitrary malformed bytes at 10^12-doc scale (SURVEY.md §7.7.1).
  *
  * The reference delegates parsing to the `select` crate
  * (reference: src/parser.rs:132-134); we own the parser so extraction is
  * deterministic and auditable.
  */
sealed trait Tok
final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Tok
final case class EndTag(name: String) extends Tok
final case class Text(data: String) extends Tok

/** Push-mode consumer for [[Tokenizer.stream]] — the zero-buffer path the
  * extraction kernel runs on (no Tok boxing, no token ArrayBuffer).
  */
trait TokenSink {
  def onText(decoded: String): Unit
  def onStartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit
  def onEndTag(name: String): Unit
}

object Tokenizer {

  /** Elements whose content never parses as markup: script/style (raw
    * text) plus title/textarea (RCDATA — treated as raw and DROPPED,
    * matching the emitter's head/boiler semantics; stray `<p>` inside a
    * textarea must not open a block).
    */
  private val RawText = Set("script", "style", "title", "textarea")

  // canonical tag/attr names: region-matched case-insensitively against
  // the source, so the common path allocates NO per-tag strings
  private val CanonNames: Array[String] = Array(
    "a", "b", "i", "p", "em", "h1", "h2", "h3", "h4", "h5", "h6", "u",
    "ul", "ol", "li", "td", "th", "tr", "div", "img", "nav", "pre",
    "span", "body", "html", "head", "form", "meta", "link", "table",
    "aside", "video", "audio", "embed", "small", "title", "strong",
    "footer", "header", "iframe", "script", "style", "button", "select",
    "option", "source", "figure", "article", "section", "textarea",
    "figcaption", "blockquote", "noscript", "template", "main", "center",
    "graft-media", "src", "alt", "href", "class", "id", "rel", "type",
    "name", "content", "data-i", "summary", "dd", "dt", "hr", "br")
  // shared with the byte twin (ByteScanner) — same canonical-name table
  // and raw-text element set keep the two scanners event-identical
  private[html] def canonByKeyShared: java.util.HashMap[Integer, Array[String]] = canonByKey
  private[html] def rawTextShared: Set[String] = RawText

  private val canonByKey: java.util.HashMap[Integer, Array[String]] = {
    val m = new java.util.HashMap[Integer, Array[String]]()
    CanonNames.foreach { nm =>
      val key = Integer.valueOf(nm.length * 128 + nm.charAt(0))
      val prev = m.get(key)
      m.put(key, if (prev == null) Array(nm) else prev :+ nm)
    }
    m
  }

  /** ASCII lower-case fold — HTML tag/attr names are ASCII-case-
    * insensitive ONLY (HTML5 §13.2.5); Unicode folding (e.g. U+017F ſ →
    * S, U+0131 ı) must NOT match tag names, and keeping the fold ASCII
    * makes the char and byte scanners char-for-char identical.
    */
  @inline private[html] def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Lower-cased name for [from, until) — returns a canonical constant
    * without allocating when the name is a known tag/attr.
    */
  private def canonName(html: String, from: Int, until: Int): String = {
    val len = until - from
    if (len > 0 && len <= 11) {
      val c0 = asciiLower(html.charAt(from))
      if (c0 < 128) {
        val cands = canonByKey.get(Integer.valueOf(len * 128 + c0))
        if (cands != null) {
          var ci = 0
          while (ci < cands.length) {
            val cand = cands(ci)
            var k = 0
            var ok = true
            while (ok && k < len) {
              if (asciiLower(html.charAt(from + k)) != cand.charAt(k)) ok = false
              k += 1
            }
            if (ok) return cand
            ci += 1
          }
        }
      }
    }
    val b = new java.lang.StringBuilder(len)
    var k = from
    while (k < until) { b.append(asciiLower(html.charAt(k))); k += 1 }
    b.toString
  }

  /** Buffering form (spec path / tests): collects [[stream]]'s events. */
  def tokenize(html: String): ArrayBuffer[Tok] = {
    val out = new ArrayBuffer[Tok](64)
    stream(html, new TokenSink {
      def onText(d: String): Unit = out += Text(d)
      def onStartTag(n: String, a: List[(String, String)], sc: Boolean): Unit =
        out += StartTag(n, a, sc)
      def onEndTag(n: String): Unit = out += EndTag(n)
    })
    out
  }

  /** Tokenize `html`, pushing events into `sink`. Never throws; on
    * truncated input, emits what it has.
    *
    * @param wantAttrs tags whose attributes the sink will read; for all
    *                  other tags the attribute region is still scanned
    *                  (quote-aware, to find the true `>`) but no names are
    *                  canonicalized, no values substring'd, and no list is
    *                  allocated — the extraction kernel only ever reads
    *                  media-tag attrs, which makes the common `<p class=…>`
    *                  path allocation-free (measured ~15% of tokenize).
    */
  def stream(html: String, sink: TokenSink,
             wantAttrs: String => Boolean = _ => true): Unit = {
    if (html == null) return
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder(256)

    def flushText(): Unit = {
      if (text.length > 0) {
        sink.onText(Entities.decode(text.toString))
        text.setLength(0)
      }
    }

    def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    while (i < n) {
      // bulk text scan: copy everything up to the next '<' in one append
      if (html.charAt(i) != '<') {
        val lt = html.indexOf('<', i)
        if (lt < 0) { text.append(html, i, n); i = n }
        else { text.append(html, i, lt); i = lt }
      }
      if (i >= n) { /* done */ }
      else {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          // comment, doctype, or CDATA — skip it
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') { // processing instruction — skip
          flushText()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          // end tag
          var j = i + 2
          if (j < n && isNameStart(html.charAt(j))) {
            flushText()
            val ns = j
            while (j < n && html.charAt(j) != '>' && !Character.isWhitespace(html.charAt(j))) j += 1
            val name = canonName(html, ns, j)
            while (j < n && html.charAt(j) != '>') j += 1
            i = if (j < n) j + 1 else n
            sink.onEndTag(name)
          } else { // "</3" etc. — literal text
            text.append(c); i += 1
          }
        } else if (isNameStart(c1)) {
          // start tag
          flushText()
          var j = i + 1
          val ns = j
          while (j < n && { val ch = html.charAt(j)
            (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
            (ch >= '0' && ch <= '9') || ch == '-' || ch == ':' }) j += 1
          val name = canonName(html, ns, j)
          val keep = wantAttrs(name)
          // attributes
          var attrs: List[(String, String)] = Nil
          var selfClosing = false
          var done = false
          while (!done && j < n) {
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j >= n) { done = true }
            else html.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                if (j + 1 < n && html.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
                else j += 1
              case _ =>
                // attribute name
                val as = j
                while (j < n && { val ch = html.charAt(j)
                  ch != '=' && ch != '>' && ch != '/' && !Character.isWhitespace(ch) }) j += 1
                val aname = if (keep) canonName(html, as, j) else ""
                var avalue = ""
                // optional = value (scanned even when !keep: a '>' inside
                // a quoted value must not terminate the tag)
                var k = j
                while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                if (k < n && html.charAt(k) == '=') {
                  k += 1
                  while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                  if (k < n) {
                    val q = html.charAt(k)
                    if (q == '"' || q == '\'') {
                      val vs = k + 1
                      val ve = html.indexOf(q, vs)
                      if (ve < 0) { if (keep) avalue = html.substring(vs); k = n }
                      else { if (keep) avalue = html.substring(vs, ve); k = ve + 1 }
                    } else {
                      val vs = k
                      while (k < n && { val ch = html.charAt(k); ch != '>' && !Character.isWhitespace(ch) }) k += 1
                      if (keep) avalue = html.substring(vs, k)
                    }
                  }
                  j = k
                }
                // values stay RAW here; Element.attr() decodes on access —
                // only media elements' attrs are ever read (hot-path win)
                if (keep && aname.nonEmpty) attrs = (aname -> avalue) :: attrs
            }
          }
          i = j
          sink.onStartTag(name, if (attrs.isEmpty) Nil else attrs.reverse, selfClosing)
          // raw-text elements: consume until matching close tag, drop content
          if (!selfClosing && RawText.contains(name)) {
            val closer = "</" + name
            var e = indexOfIgnoreCase(html, closer, i)
            if (e < 0) { i = n }
            else {
              var g = e + closer.length
              while (g < n && html.charAt(g) != '>') g += 1
              i = if (g < n) g + 1 else n
              sink.onEndTag(name)
            }
          }
        } else { // '<' followed by junk — literal
          text.append(c); i += 1
        }
      } else {
        text.append(c); i += 1 // lone '<' at end of input
      }
      }
    }
    flushText()
  }

  /** ASCII-case-insensitive search (needle is lowercase ASCII) — Unicode
    * case folds must not close raw-text elements (see [[asciiLower]]).
    */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      var ok = true
      while (ok && k < m) {
        if (asciiLower(hay.charAt(i + k)) != needle.charAt(k)) ok = false
        k += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }
}

/** Minimal HTML entity decoder: named core set + numeric refs. Never throws. */
object Entities {
  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "laquo" -> "«", "raquo" -> "»",
    "rsquo" -> "’", "lsquo" -> "‘", "rdquo" -> "”",
    "ldquo" -> "“", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "deg" -> "°", "eacute" -> "é",
    "agrave" -> "à", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "szlig" -> "ß", "ccedil" -> "ç"
  )

  def decode(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return if (s == null) "" else s
    val n = s.length
    val b = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#")) {
            val numStr = body.substring(1)
            val cp: Int =
              try {
                if (numStr.startsWith("x") || numStr.startsWith("X"))
                  Integer.parseInt(numStr.substring(1), 16)
                else Integer.parseInt(numStr)
              } catch { case _: Exception => -1 }
            if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) {
              b.appendCodePoint(cp); i = semi + 1
            } else { b.append(c); i += 1 }
          } else named.get(body) match {
            case Some(rep) => b.append(rep); i = semi + 1
            case None      => b.append(c); i += 1
          }
        } else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
