package graft.pdf

import graft.model.Span
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic PDF generator — the span ORACLE for the PDF path,
  * mirroring `graft.synth.Synth` for HTML: the builder and
  * [[PdfScanner]] agree BY CONSTRUCTION on the expected title + span
  * sequence, and generation is a pure function of (seed, idx) so any
  * partitioning sees byte-identical corpora (PdfSpec asserts equality
  * doc-for-doc; never change the generator without the scanner).
  *
  * Exercised variation per doc (all scanner-subset features):
  *  - content stream raw vs FlateDecode;
  *  - literal `(…)` strings (with escaped delimiters/backslashes and an
  *    octal escape) vs hex `<…>` strings;
  *  - multi-line paragraphs via `Td`/`TD`/`T*`/`'` line moves;
  *  - 0-2 interleaved image placements (`/ImN Do`);
  *  - en / ru (UTF-8 Cyrillic in strings) / dropped docs (all-decorative
  *    text in a confusable language, failing the en/ru gate);
  *  - string encodings (VERDICT r3 item 4): UTF-8 (default), WinAnsi
  *    (`/Encoding /WinAnsiEncoding`, cp1252 bytes incl. the 0x80-0x9F
  *    zone via an em-dash and accented Latin — en docs only, cp1252
  *    carries no Cyrillic), a 2-byte `/ToUnicode` CMap (custom codes
  *    for space + a-z + а-я declared via beginbfchar + two beginbfrange
  *    runs — en and ru docs), a dict-form `/Encoding` with
  *    `/Differences` overriding low codes with AGL glyph names +
  *    a `uniXXXX` name (en docs), a Type0 `/Identity-H` composite
  *    font (en and ru docs): descendant CIDFont object + ToUnicode CMap
  *    whose a-z CID run spans the 0x00FF/0x0100 code-page boundary
  *    (VERDICT r4 item 2), and a Type0 with STREAM-FORM `/Encoding
  *    10 0 R` (en and ru docs): the ref resolves to an embedded CMap
  *    stream (codespacerange + identity cidrange) alongside the same
  *    descendant + ToUnicode (VERDICT r5 item 2);
  *  - PDF 1.5 packaging (~25% of kept docs, orthogonal to encoding
  *    mode): font + descendant dicts packed inside a `/Type /ObjStm`
  *    object stream (raw or Flate) instead of top-level objects —
  *    exercises the scanner's object-stream expansion;
  *  - indirect `/Length 12 0 R` on the content stream (~25% of kept
  *    UTF-8/literal docs), resolved via a bare integer object, with a
  *    literal `endstream` token inside the first paragraph — the
  *    endstream-scan fallback would truncate the content mid-paragraph,
  *    so the span oracle distinguishes length resolution end-to-end.
  */
object PdfSynth {

  final case class PdfTruth(doc_id: String, pdf: Array[Byte], kept: Boolean,
                            lang: String, title: String, expected: Array[Span])

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick[A](arr: IndexedSeq[A], h: Long): A = arr(((h >>> 8) % arr.length).toInt.abs)

  private val EnWords = Vector("the", "market", "report", "and", "annual", "of",
    "growth", "review", "energy", "policy", "board", "summary", "with", "results",
    "quarter", "trade", "union", "council", "science", "budget")
  private val RuWords = Vector("отчет", "рынок", "годовой", "обзор", "и", "рост",
    "энергия", "политика", "совет", "итоги", "квартал", "торговля", "союз", "наука")
  // Spanish-leaning words: detected as a confusable → doc dropped by the gate
  private val EsWords = Vector("el", "mercado", "informe", "anual", "crecimiento",
    "energía", "política", "consejo", "resultados", "trimestre", "comercio")

  private def words(pool: Vector[String], h: Long, n: Int): String =
    (0 until n).map(k => pick(pool, mix(h + k))).mkString(" ")

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val def_ = new java.util.zip.Deflater()
    def_.setInput(bytes); def_.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) out.write(buf, 0, def_.deflate(buf))
    def_.end()
    out.toByteArray
  }

  /** One synthetic PDF + its expected extraction. */
  def gen(seed: Long, idx: Long): PdfTruth = {
    val h = mix(seed ^ mix(idx))
    val langRoll = (mix(h + 1) & 0xff).toInt
    val (pool, lang) =
      if (langRoll < 160) (EnWords, "en")
      else if (langRoll < 224) (RuWords, "ru")
      else (EsWords, "es") // dropped by the en/ru whitelist
    val flate0 = (mix(h + 2) & 1L) == 0L
    // string encoding: 0 = UTF-8, 2 = WinAnsi (en only — cp1252 carries
    // no Cyrillic; a ru WinAnsi roll falls back to UTF-8), 3 = 2-byte
    // ToUnicode CMap codes, 5 = Type0 /Identity-H composite font with a
    // descendant CIDFont + ToUnicode (VERDICT r4 item 2; en and ru),
    // 6 = Type0 with STREAM-FORM /Encoding 10 0 R — an indirect ref to
    // an embedded CMap stream (codespacerange + cidrange) — plus the
    // same descendant + ToUnicode (VERDICT r5 item 2; en and ru).
    // Dropped-language docs stay UTF-8.
    val encRoll = (mix(h + 9) % 6).toInt.abs
    val encMode =
      if (lang == "es") 0
      else if (encRoll == 1) 6
      else if (encRoll == 2 && lang == "en") 2
      else if (encRoll == 3) 3
      else if (encRoll == 4 && lang == "en") 4 // /Differences over WinAnsi
      else if (encRoll == 5) 5
      else 0
    // indirect-/Length roll (VERDICT r5 item 2 companion): the content
    // stream declares `/Length 12 0 R` resolved via a separate integer
    // object, goes RAW with literal strings, and its first paragraph
    // carries a literal `endstream` token — without indirect-length
    // resolution the fallback scan truncates the content mid-paragraph,
    // so the span oracle distinguishes the feature end-to-end
    val indirectLen = lang != "es" && encMode == 0 && (mix(h + 13) & 3L) == 0L
    val flate = flate0 && !indirectLen
    // PDF 1.5 packaging roll (~25% of kept docs, every encoding mode):
    // the font dict (and the descendant CIDFont for modes 5/6) is packed
    // inside a /Type /ObjStm object stream instead of a top-level
    // `N G obj` object — pure packaging, spans unchanged; exercises the
    // scanner's ObjStm expansion (the modern-writer shape that hides
    // font dicts from a raw byte scan). CMap streams stay top-level
    // (the spec forbids streams inside an ObjStm).
    val objStm = lang != "es" && (mix(h + 12) & 3L) == 0L
    // encoded modes always use hex strings (codes are raw bytes)
    val hexStrings = !indirectLen &&
      (encMode != 0 || (mix(h + 3) & 3L) == 0L) // hex strings can't carry escapes
    val nParas = 1 + (mix(h + 4) & 3L).toInt // 1-4
    val nImages = (mix(h + 5) % 3).toInt.abs  // 0-2

    // en titles lead with a guaranteed profile stopword: the language
    // vote is stopword-based and a short all-content-word title could
    // otherwise return no evidence (→ dropped) nondeterministically
    // w.r.t. the word roll; ru needs none (script range suffices)
    val titleLead = if (lang == "en") "the " else ""
    val title = titleLead + words(pool, h + 10, 3 + (mix(h + 6) & 3L).toInt)
    val paras = (0 until nParas).map { p =>
      val lines = 1 + (mix(h + 20 + p) & 2L).toInt // 1-3 lines
      (0 until lines).map(l => words(pool, h + 100 + p * 10 + l, 4 + (mix(h + 7 + l) & 3L).toInt))
    }
    // one paragraph (when literal strings are on) carries delimiters + an
    // octal escape to keep the escape table honest end-to-end (mutually
    // exclusive with the indirect-length endstream paragraph — both
    // target paragraph 0 line 0)
    val escPara = !indirectLen && !hexStrings && (mix(h + 8) & 3L) == 0L

    val content = new StringBuilder
    // CMap code table (encMode 3): space + a-z + а-я — everything the
    // word pools and title lead can produce. The PDF-side CMap below
    // declares EXACTLY these codes, so scanner↔generator stay in lockstep.
    def cmapCode(c: Char): Int =
      if (c == ' ') 0x0001
      else if (c >= 'a' && c <= 'z') 0x0200 + (c - 'a')
      else if (c >= 'а' && c <= 'я') 0x0300 + (c - 'а')
      else 0 // never produced by the generator's text
    // Type0 CIDs (encModes 5/6): the a-z run 0x00F0-0x0109 deliberately
    // SPANS the 0x00FF/0x0100 code-page boundary so the scanner's
    // 2-byte bfrange expansion is exercised across it
    def cidCode(c: Char): Int =
      if (c == ' ') 0x0003
      else if (c >= 'a' && c <= 'z') 0x00f0 + (c - 'a')
      else if (c >= 'а' && c <= 'я') 0x0210 + (c - 'а')
      else 0 // never produced by the generator's text
    def str(s: String): String = encMode match {
      case 2 => // WinAnsi: cp1252 bytes as a hex string
        "<" + s.getBytes("windows-1252").map(b => f"${b & 0xff}%02x").mkString + ">"
      case 4 => // Differences codes 1-3 override é — ž; rest is cp1252
        "<" + s.map { c =>
          val b = c match {
            case 'é' => 1
            case '—' => 2
            case 'ž' => 3
            case ch  => ch.toString.getBytes("windows-1252")(0) & 0xff
          }
          f"$b%02x"
        }.mkString + ">"
      case 3 => // 2-byte custom codes as a hex string
        "<" + s.map(c => f"${cmapCode(c)}%04x").mkString + ">"
      case 5 | 6 => // Type0 composite: 2-byte CIDs as a hex string
        "<" + s.map(c => f"${cidCode(c)}%04x").mkString + ">"
      case _ if hexStrings =>
        "<" + s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString + ">"
      case _ =>
        val esc = s.flatMap {
          case '\\' => "\\\\"
          case '('  => "\\("
          case ')'  => "\\)"
          case c    => c.toString
        }
        "(" + esc + ")"
    }
    content.append(s"BT /F1 24 Tf 72 720 Td ${str(title)} Tj ET\n")
    val expectedTexts = new scala.collection.mutable.ArrayBuffer[String]
    expectedTexts += title
    paras.zipWithIndex.foreach { case (lines, p) =>
      content.append("BT /F1 11 Tf 72 680 Td ")
      val shown = new scala.collection.mutable.ArrayBuffer[String]
      lines.zipWithIndex.foreach { case (line, l) =>
        val text =
          // indirect-/Length docs carry a literal `endstream` token the
          // fallback scan would truncate at ('qq' is in no LangId profile)
          if (indirectLen && p == 0 && l == 0) line + " endstream qq"
          else if (escPara && p == 0 && l == 0) s"(paren) \\ qq A" // A arrives via octal \101; 'qq' is in no language profile
          // WinAnsi docs carry accented Latin + an em-dash (cp1252 0x97,
          // the 0x80-0x9F zone where cp1252 ≠ Latin-1): gibberish tokens
          // in no LangId profile, so the en vote is untouched
          else if (encMode == 2 && p == 0 && l == 0) line + " zürq—ölwë"
          // Differences docs exercise all three overridden codes
          else if (encMode == 4 && p == 0 && l == 0) line + " zéq—žt"
          else line
        val encoded =
          if (escPara && p == 0 && l == 0 && !hexStrings)
            "(\\(paren\\) \\\\ qq \\101)" // exercises delimiter + octal escapes
          else str(text)
        val mover = (mix(h + 300 + p * 10 + l) % 4).toInt.abs
        if (l > 0) mover match {
          case 0 => content.append("0 -14 Td ")
          case 1 => content.append("0 -14 TD ")
          case 2 => content.append("T* ")
          case _ => () // the ' operator moves AND shows below
        }
        if (l > 0 && mover == 3) content.append(s"$encoded ' ")
        else content.append(s"$encoded Tj ")
        shown += text
      }
      content.append("ET\n")
      expectedTexts += shown.mkString(" ")
    }
    // interleave: images go after paragraph k (deterministic positions);
    // the content-side Do placement below mirrors the expected sequence
    val imgAfter = (0 until nImages).map(k => (mix(h + 400 + k) % nParas).toInt.abs).sorted
    val contentWithImages = {
      val blocks = content.toString.split("\n").filter(_.nonEmpty)
      val sb = new StringBuilder
      var ii = 0
      blocks.zipWithIndex.foreach { case (b, bi) =>
        sb.append(b).append("\n")
        val paraIdx = bi - 1 // block 0 is the title
        while (paraIdx >= 0 && ii < imgAfter.length && imgAfter(ii) == paraIdx) {
          sb.append(s"/Im${ii + 1} Do\n")
          ii += 1
        }
      }
      sb.toString
    }
    // rebuild expected spans WITH images at the same interleave points
    val expected = new scala.collection.mutable.ArrayBuffer[Span]
    expected += Span("text", graft.html.SpanEmitter.collapseWs(expectedTexts.head), "", 0)
    var o = 1
    var ij = 0
    paras.indices.foreach { p =>
      expected += Span("text", graft.html.SpanEmitter.collapseWs(expectedTexts(p + 1)), "", o)
      o += 1
      while (ij < imgAfter.length && imgAfter(ij) == p) {
        expected += Span("image", "", s"Im${ij + 1}", o)
        o += 1; ij += 1
      }
    }

    val contentBytes0 = contentWithImages.getBytes("UTF-8")
    val contentBytes = if (flate) deflate(contentBytes0) else contentBytes0

    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("UTF-8"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w(s"4 0 obj << /Length " +
      (if (indirectLen) "12 0 R" else contentBytes.length.toString) +
      (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
    bos.write(contentBytes)
    w("\nendstream\nendobj\n")
    // the indirect-length target: a bare integer object (real-world
    // writers emit it AFTER the stream, when the length becomes known)
    if (indirectLen) w(s"12 0 obj ${contentBytes.length} endobj\n")
    // Type0 composite font (encModes 5/6), the real-world CID shape:
    // Identity-H (5) or a stream-form /Encoding ref (6), a descendant
    // CIDFont (obj 8, pass-through for the scanner), and the ToUnicode
    // CMap carrying the only text mapping
    val fontDictStr =
      if (encMode == 5 || encMode == 6)
        "<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
          (if (encMode == 5) "/Encoding /Identity-H " else "/Encoding 10 0 R ") +
          "/DescendantFonts [8 0 R] /ToUnicode 7 0 R >>"
      else
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
          (if (encMode == 2) " /Encoding /WinAnsiEncoding" else "") +
          (if (encMode == 3) " /ToUnicode 7 0 R" else "") +
          (if (encMode == 4)
            " /Encoding << /BaseEncoding /WinAnsiEncoding /Differences [ 1 /eacute 2 /emdash 3 /uni017E ] >>"
           else "") +
          " >>"
    val descDictStr =
      if (encMode == 5 || encMode == 6)
        Some("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
          "/CIDToGIDMap /Identity >>")
      else None
    if (objStm) {
      // header = N (objnum, offset) pairs; offsets relative to /First
      val bodies = Seq(5 -> fontDictStr) ++ descDictStr.map(8 -> _)
      var off = 0
      val header = bodies.map { case (num, body) =>
        val pair = s"$num $off"
        off += body.length + 1 // bodies separated by \n
        pair
      }.mkString(" ") + "\n"
      val payload = (header + bodies.map(_._2).mkString("\n") + "\n").getBytes("UTF-8")
      val stmBytes = if (flate) deflate(payload) else payload
      w(s"9 0 obj << /Type /ObjStm /N ${bodies.size} /First ${header.getBytes("UTF-8").length} " +
        s"/Length ${stmBytes.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      bos.write(stmBytes)
      w("\nendstream\nendobj\n")
    } else {
      w(s"5 0 obj $fontDictStr endobj\n")
      descDictStr.foreach(d => w(s"8 0 obj $d endobj\n"))
    }
    // the embedded /Encoding CMap stream (encMode 6): codespacerange
    // (the code-width signal the scanner reads) + an identity cidrange
    // over exactly the generator's CID runs — cid mappings, no bf
    // sections, per spec. Top-level (streams can't live in an ObjStm).
    if (encMode == 6) {
      val enc = ("/CIDInit /ProcSet findresource begin\n" +
        "begincmap\n/CMapName /GraftEnc def\n/CMapType 1 def\n" +
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n" +
        "3 begincidrange\n<0003> <0003> 3\n<00f0> <0109> 240\n<0210> <022f> 528\nendcidrange\n" +
        "endcmap\nend\n").getBytes("UTF-8")
      val encBytes = if (flate) deflate(enc) else enc
      w(s"10 0 obj << /Length ${encBytes.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      bos.write(encBytes)
      w("\nendstream\nendobj\n")
    }
    if (encMode == 3 || encMode == 5 || encMode == 6) {
      // the ToUnicode CMap stream declaring the 2-byte codes: one bfchar
      // (space) + two bfrange runs (a-z, а-я). The Type0 (5/6) a-z run
      // 0x00F0-0x0109 spans the 0x00FF/0x0100 code-page boundary.
      val ranges =
        if (encMode == 3) "2 beginbfrange\n<0200> <0219> <0061>\n<0300> <031f> <0430>\nendbfrange\n"
        else "2 beginbfrange\n<00f0> <0109> <0061>\n<0210> <022f> <0430>\nendbfrange\n"
      val bfchar =
        if (encMode == 3) "1 beginbfchar\n<0001> <0020>\nendbfchar\n"
        else "1 beginbfchar\n<0003> <0020>\nendbfchar\n"
      val cmap = ("/CIDInit /ProcSet findresource begin\n" +
        "begincmap\n/CMapName /GraftUni def\n" +
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n" +
        bfchar + ranges +
        "endcmap\nend\n").getBytes("UTF-8")
      val cmapBytes = if (flate) deflate(cmap) else cmap
      w(s"7 0 obj << /Length ${cmapBytes.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      bos.write(cmapBytes)
      w("\nendstream\nendobj\n")
    }
    // a tiny (non-content) image stream: bytes chosen with no BT/Do tokens
    if (nImages > 0) {
      val imgData = Array.tabulate[Byte](16)(k => (mix(h + 500 + k) & 0x3f).toByte)
      w(s"6 0 obj << /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${imgData.length} >>\nstream\n")
      bos.write(imgData)
      w("\nendstream\nendobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")

    val kept = lang == "en" || lang == "ru"
    PdfTruth(f"pdf-$idx%09d", bos.toByteArray, kept, if (kept) lang else "",
      graft.html.SpanEmitter.collapseWs(title), expected.toArray)
  }

  /** (doc_id, pdf bytes) corpus — pure function of (seed, idx). */
  def corpus(spark: SparkSession, seed: Long, nDocs: Long,
             partitions: Int = 0): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, parts).map { i =>
      val t = gen(seed, i)
      (t.doc_id, t.pdf)
    }
  }

  def truths(spark: SparkSession, seed: Long, nDocs: Long,
             partitions: Int = 0): Dataset[PdfTruth] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, parts).map(i => gen(seed, i))
  }
}
