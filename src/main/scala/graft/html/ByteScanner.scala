package graft.html

/** Byte-level twin of [[Tokenizer.stream]]: scans raw UTF-8 bytes and
  * pushes the SAME [[TokenSink]] events. HTML structure (tags, attribute
  * quoting, comments, raw-text elements) is pure ASCII, so the scanner
  * never decodes; only KEPT text runs (and wanted-tag attribute values)
  * are decoded to String — which is what makes this the hot path for
  * Tungsten input: the full document's UTF-8 → UTF-16 conversion and the
  * Doc/Span object materialization of the encoder boundary are skipped,
  * and dropped boilerplate/scripts/tags are never decoded at all
  * (see [[graft.extract.ExtractSpansExpr]]).
  *
  * Parity contract with the char scanner (asserted by ByteExtractSpec
  * over the synth oracle corpus, adversarial markup, and random fuzz):
  * identical events for any valid UTF-8 input. Both scanners fold tag
  * names ASCII-only (HTML5 §13.2.5 — a Unicode case-fold like U+017F ſ
  * must not match `s` in a tag name). Known deliberate deviation: a
  * non-ASCII Unicode whitespace INSIDE a tag (e.g. U+2028 between
  * attributes — malformed HTML) separates attributes on the char path
  * but not here.
  */
object ByteScanner {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  private def isNameStart(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b & 0xff

  /** Canonical tag/attr name for bytes [from, until) — allocation-free on
    * the known-name path (same canonical table as the char scanner).
    */
  private def canonName(bytes: Array[Byte], from: Int, until: Int): String = {
    val len = until - from
    if (len > 0 && len <= 11) {
      val c0 = lower(bytes(from))
      if (c0 < 128) {
        val cands = Tokenizer.canonByKeyShared.get(Integer.valueOf(len * 128 + c0))
        if (cands != null) {
          var ci = 0
          while (ci < cands.length) {
            val cand = cands(ci)
            var k = 0
            var ok = true
            while (ok && k < len) {
              if (lower(bytes(from + k)) != cand.charAt(k)) ok = false
              k += 1
            }
            if (ok) return cand
            ci += 1
          }
        }
      }
    }
    // ASCII fold only (HTML5 tag names; matches the char scanner exactly)
    val raw = new String(bytes, from, len, java.nio.charset.StandardCharsets.UTF_8)
    val b = new java.lang.StringBuilder(raw.length)
    var k = 0
    while (k < raw.length) { b.append(Tokenizer.asciiLower(raw.charAt(k))); k += 1 }
    b.toString
  }

  private def str(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  /** index of ASCII byte `c` in [from, n) or -1 */
  private def indexOf(bytes: Array[Byte], n: Int, c: Byte, from: Int): Int = {
    var i = from
    while (i < n) { if (bytes(i) == c) return i; i += 1 }
    -1
  }

  private def startsWith(bytes: Array[Byte], n: Int, at: Int, s: String): Boolean = {
    if (at + s.length > n) return false
    var k = 0
    while (k < s.length) { if (bytes(at + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  /** ASCII-case-insensitive search for `needle` (lowercase ASCII). */
  private def indexOfIgnoreCase(bytes: Array[Byte], n: Int, needle: String, from: Int): Int = {
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      var ok = true
      while (ok && k < m) { if (lower(bytes(i + k)) != needle.charAt(k)) ok = false; k += 1 }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Scan `bytes[0, n)`, pushing events into `sink` — the byte twin of
    * [[Tokenizer.stream]] (structure identical branch-for-branch).
    */
  def stream(bytes: Array[Byte], n: Int, sink: TokenSink,
             wantAttrs: String => Boolean = _ => true): Unit = {
    if (bytes == null) return
    var i = 0
    var buf = new Array[Byte](256)
    var bufLen = 0

    def append(from: Int, until: Int): Unit = {
      val len = until - from
      if (len > 0) {
        if (bufLen + len > buf.length) {
          val grown = new Array[Byte](math.max(buf.length * 2, bufLen + len))
          System.arraycopy(buf, 0, grown, 0, bufLen)
          buf = grown
        }
        System.arraycopy(bytes, from, buf, bufLen, len)
        bufLen += len
      }
    }

    def appendByte(b: Byte): Unit = {
      if (bufLen + 1 > buf.length) {
        val grown = new Array[Byte](buf.length * 2)
        System.arraycopy(buf, 0, grown, 0, bufLen)
        buf = grown
      }
      buf(bufLen) = b; bufLen += 1
    }

    def flushText(): Unit = {
      if (bufLen > 0) {
        sink.onText(Entities.decode(
          new String(buf, 0, bufLen, java.nio.charset.StandardCharsets.UTF_8)))
        bufLen = 0
      }
    }

    while (i < n) {
      // bulk text scan: copy everything up to the next '<' in one append
      if (bytes(i) != '<') {
        val lt = indexOf(bytes, n, '<', i)
        if (lt < 0) { append(i, n); i = n }
        else { append(i, lt); i = lt }
      }
      if (i >= n) { /* done */ }
      else {
        val c = bytes(i)
        if (c == '<' && i + 1 < n) {
          val c1 = bytes(i + 1)
          if (c1 == '!') {
            // comment, doctype, or CDATA — skip it
            flushText()
            if (startsWith(bytes, n, i, "<!--")) {
              var end = -1
              var j = i + 4
              while (end < 0 && j + 3 <= n) {
                if (bytes(j) == '-' && bytes(j + 1) == '-' && bytes(j + 2) == '>') end = j
                j += 1
              }
              i = if (end < 0) n else end + 3
            } else {
              val end = indexOf(bytes, n, '>', i + 2)
              i = if (end < 0) n else end + 1
            }
          } else if (c1 == '?') { // processing instruction — skip
            flushText()
            val end = indexOf(bytes, n, '>', i + 2)
            i = if (end < 0) n else end + 1
          } else if (c1 == '/') {
            // end tag
            var j = i + 2
            if (j < n && isNameStart(bytes(j))) {
              flushText()
              val ns = j
              while (j < n && bytes(j) != '>' && !isWs(bytes(j))) j += 1
              val name = canonName(bytes, ns, j)
              while (j < n && bytes(j) != '>') j += 1
              i = if (j < n) j + 1 else n
              sink.onEndTag(name)
            } else { // "</3" etc. — literal text
              appendByte(c); i += 1
            }
          } else if (isNameStart(c1)) {
            // start tag
            flushText()
            var j = i + 1
            val ns = j
            while (j < n && { val ch = bytes(j)
              (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
              (ch >= '0' && ch <= '9') || ch == '-' || ch == ':' }) j += 1
            val name = canonName(bytes, ns, j)
            val keep = wantAttrs(name)
            // attributes
            var attrs: List[(String, String)] = Nil
            var selfClosing = false
            var done = false
            while (!done && j < n) {
              while (j < n && isWs(bytes(j))) j += 1
              if (j >= n) { done = true }
              else bytes(j) match {
                case '>' => j += 1; done = true
                case '/' =>
                  if (j + 1 < n && bytes(j + 1) == '>') { selfClosing = true; j += 2; done = true }
                  else j += 1
                case _ =>
                  // attribute name
                  val as = j
                  while (j < n && { val ch = bytes(j)
                    ch != '=' && ch != '>' && ch != '/' && !isWs(ch) }) j += 1
                  val aname = if (keep) canonName(bytes, as, j) else ""
                  var avalue = ""
                  // optional = value (quote-aware even when !keep)
                  var k = j
                  while (k < n && isWs(bytes(k))) k += 1
                  if (k < n && bytes(k) == '=') {
                    k += 1
                    while (k < n && isWs(bytes(k))) k += 1
                    if (k < n) {
                      val q = bytes(k)
                      if (q == '"' || q == '\'') {
                        val vs = k + 1
                        val ve = indexOf(bytes, n, q, vs)
                        if (ve < 0) { if (keep) avalue = str(bytes, vs, n); k = n }
                        else { if (keep) avalue = str(bytes, vs, ve); k = ve + 1 }
                      } else {
                        val vs = k
                        while (k < n && { val ch = bytes(k); ch != '>' && !isWs(ch) }) k += 1
                        if (keep) avalue = str(bytes, vs, k)
                      }
                    }
                    j = k
                  }
                  if (keep && aname.nonEmpty) attrs = (aname -> avalue) :: attrs
              }
            }
            i = j
            sink.onStartTag(name, if (attrs.isEmpty) Nil else attrs.reverse, selfClosing)
            // raw-text elements: consume until matching close tag, drop content
            if (!selfClosing && Tokenizer.rawTextShared.contains(name)) {
              val closer = "</" + name
              val e = indexOfIgnoreCase(bytes, n, closer, i)
              if (e < 0) { i = n }
              else {
                var g = e + closer.length
                while (g < n && bytes(g) != '>') g += 1
                i = if (g < n) g + 1 else n
                sink.onEndTag(name)
              }
            }
          } else { // '<' followed by junk — literal
            appendByte(c); i += 1
          }
        } else {
          appendByte(c); i += 1 // lone '<' at end of input
        }
      }
    }
    flushText()
  }
}
