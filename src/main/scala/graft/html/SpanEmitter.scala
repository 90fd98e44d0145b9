package graft.html

import graft.model.Span
import scala.collection.mutable.ArrayBuffer

/** Main-content extraction: walk the DOM in document order, strip
  * boilerplate by container semantics + link density, and emit ordered
  * spans of kind text/image/embed.
  *
  * Generalizes the reference's h1-only "body extraction"
  * (reference: src/parser.rs:132-140) per SURVEY.md §7.2. The rules are
  * deterministic and fixture-defining (the synth generator is the oracle):
  *
  *  - subtrees under {nav, header, footer, aside, script, style, noscript,
  *    form, button, select, template} are boilerplate → skipped entirely;
  *  - block elements (p, h1-h6, li, blockquote, pre, td, figcaption)
  *    emit one `text` span of their whitespace-collapsed inner text,
  *    if non-empty and (heading OR link density ≤ 1/3);
  *  - bare text directly under flow containers (div/article/section/body)
  *    is merged into a `text` span per contiguous run;
  *  - <img src> → `image` span (media_ref = src, text = alt);
  *  - <iframe src>/<embed src>/<video src|source> → `embed` span;
  *  - <graft-media> placeholders (interleaved media input spans,
  *    see [[graft.extract.Extract]]) → `image` span, always emitted;
  *  - `offset` = 0-based emission order.
  */
object SpanEmitter {

  private val Boiler = Set(
    "nav", "header", "footer", "aside", "script", "style", "noscript",
    "form", "button", "select", "option", "template", "head")

  private val TextBlocks = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote", "pre",
    "td", "th", "figcaption", "summary", "dd", "dt")

  private val Headings = Set("h1", "h2", "h3", "h4", "h5", "h6")

  private val FlowContainers = Set(
    "#root", "html", "body", "div", "article", "section", "main", "figure",
    "ul", "ol", "table", "tbody", "thead", "tr", "dl", "span", "center")

  final case class Result(spans: Array[Span], title: String)

  /** Collapse whitespace runs to single spaces and trim. */
  def collapseWs(s: String): String = {
    val n = s.length
    val b = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (b.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { b.append(' '); pendingSpace = false }
        b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Inner text + link-density stats in ONE walk (fused: this is the
    * hottest loop in extraction — the two-pass form cost ~40% of emit).
    * Returns (collapsed text, total text chars, chars under <a>).
    */
  private def textWithStats(el: Element): (String, Int, Int) = {
    val b = new java.lang.StringBuilder(64)
    var linked = 0
    def rec(n: Node, inA: Boolean): Unit = n match {
      case TextNode(d) =>
        b.append(d).append(' ')
        if (inA) linked += collapsedLen(d)
      case e: Element =>
        if (!Boiler.contains(e.name)) {
          val a = inA || e.name == "a"
          var i = 0
          while (i < e.children.length) { rec(e.children(i), a); i += 1 }
        }
    }
    rec(el, inA = false)
    val text = collapseWs(b.toString)
    (text, text.length, linked)
  }

  /** Length of collapseWs(s) without building the string. */
  private def collapsedLen(s: String): Int = {
    var len = 0
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      if (Character.isWhitespace(s.charAt(i))) { if (len > 0) pendingSpace = true }
      else { if (pendingSpace) { len += 1; pendingSpace = false }; len += 1 }
      i += 1
    }
    len
  }

  private def innerText(el: Element): String = textWithStats(el)._1

  /** Extract ordered spans + title from a built DOM.
    *
    * @param mediaTable lookup for <graft-media data-i="K"> placeholders:
    *                   index → (media_ref, alt text)
    */
  def emit(root: Element, mediaTable: Array[(String, String)]): Result = {
    val out = new ArrayBuffer[Span](16)
    var lastH1 = "" // last <h1> wins, reference-faithful (src/parser.rs:138-140, Q9)
    val run = new java.lang.StringBuilder(0) // contiguous bare-text run

    def flushRun(): Unit = {
      val t = collapseWs(run.toString)
      run.setLength(0)
      if (t.nonEmpty) out += Span("text", t, "", out.length)
    }

    def emitMedia(e: Element): Unit = e.name match {
      case "img" =>
        val src = e.attr("src")
        if (src.nonEmpty) out += Span("image", collapseWs(e.attr("alt")), src, out.length)
      case "iframe" | "embed" =>
        val src = e.attr("src")
        if (src.nonEmpty) out += Span("embed", "", src, out.length)
      case "video" | "audio" =>
        var src = e.attr("src")
        if (src.isEmpty) {
          var i = 0
          while (src.isEmpty && i < e.children.length) {
            e.children(i) match {
              case s: Element if s.name == "source" => src = s.attr("src")
              case _ =>
            }
            i += 1
          }
        }
        if (src.nonEmpty) out += Span("embed", "", src, out.length)
      case "graft-media" =>
        val idx = try e.attr("data-i").toInt catch { case _: Exception => -1 }
        if (idx >= 0 && idx < mediaTable.length) {
          val (ref, alt) = mediaTable(idx)
          out += Span("image", collapseWs(alt), ref, out.length)
        }
      case _ =>
    }

    def walk(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case TextNode(d) => run.append(d).append(' ')
          case c: Element =>
            if (Boiler.contains(c.name)) { flushRun() }
            else if (c.name == "img" || c.name == "iframe" || c.name == "embed" ||
                     c.name == "video" || c.name == "audio" || c.name == "graft-media") {
              flushRun(); emitMedia(c)
            } else if (TextBlocks.contains(c.name)) {
              flushRun()
              val (txt, total, linked) = textWithStats(c)
              if (c.name == "h1" && txt.nonEmpty) lastH1 = txt
              if (txt.nonEmpty) {
                val keep =
                  if (Headings.contains(c.name)) true
                  else total > 0 && linked * 3 <= total
                if (keep) out += Span("text", txt, "", out.length)
              }
              // media nested inside a text block still surfaces, in order
              emitNestedMedia(c)
            } else if (FlowContainers.contains(c.name) || c.name == "a" ||
                       c.name == "b" || c.name == "i" || c.name == "em" ||
                       c.name == "strong" || c.name == "u" || c.name == "small") {
              if (c.name == "a" || c.name == "b" || c.name == "i" || c.name == "em" ||
                  c.name == "strong" || c.name == "u" || c.name == "small") {
                // inline: contribute to the current bare-text run
                run.append(innerText(c)).append(' ')
              } else { flushRun(); walk(c) }
            } else { flushRun(); walk(c) } // unknown element: recurse as container
        }
        i += 1
      }
      flushRun()
    }

    def emitNestedMedia(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case c: Element =>
            c.name match {
              case "img" | "iframe" | "embed" | "video" | "audio" | "graft-media" =>
                emitMedia(c)
              case other if !Boiler.contains(other) => emitNestedMedia(c)
              case _ =>
            }
          case _ =>
        }
        i += 1
      }
    }

    walk(root)
    Result(out.toArray, lastH1)
  }
}
