package graft.gloss

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable

/** Glossary (dimension-dictionary) loading.
  *
  * Replaces the reference's 13 embedded-asset loaders
  * (reference: src/nlu/librarian.rs:40-455). Differences are deliberate
  * (SURVEY.md Q2-Q4, D1): missing/unparseable assets FAIL the build
  * instead of silently loading empty, filenames are correct, and all
  * terms are normalized with the real Unicode normalizer.
  *
  * ≈45k short strings in production (≪10 MB) — loaded once on the driver
  * and broadcast (SURVEY.md §2.3).
  */
object Glossary {

  private val mapper = new ObjectMapper()

  private def readResource(name: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/glossary/$name")
    require(in != null, s"glossary asset missing: $name") // no silent skip (Q4)
    try mapper.readTree(in)
    finally in.close()
  }

  private def strings(node: JsonNode, field: String): Seq[String] = {
    val arr = node.get(field)
    require(arr != null && arr.isArray, s"expected array field '$field'")
    (0 until arr.size).map(arr.get(_).asText())
  }

  private def norm(s: String): String = graft.extract.TitleKey.normTitle(s)

  /** theme → normalized term list. Themes mirror the reference's
    * (src/nlu/glossary.rs:49-80) minus the never-used ops glossary (Q5).
    */
  def loadThemes(): Map[String, Array[String]] = {
    val out = mutable.LinkedHashMap[String, Array[String]]()
    out("sports") = strings(readResource("sports.json"), "sports").map(norm).toArray
    val corp = strings(readResource("fortune500.json"), "companies") ++ {
      val nas = readResource("nasdaq.json").get("corporations")
      require(nas != null && nas.isArray, "nasdaq.json#corporations")
      (0 until nas.size).map(nas.get(_).get("name").asText())
    }
    out("corp") = corp.map(norm).distinct.toArray
    val steam = readResource("steam.json").get("applist").get("apps")
    out("games") = (0 until steam.size).map(i => norm(steam.get(i).get("name").asText())).toArray
    out("tech") = strings(readResource("tech.json"), "terms").map(norm).toArray
    out("science") = strings(readResource("science.json"), "terms").map(norm).toArray
    out("medicine") = strings(readResource("medicine.json"), "terms").map(norm).toArray
    out("music") = strings(readResource("music.json"), "terms").map(norm).toArray
    out("book") = strings(readResource("books.json"), "terms").map(norm).toArray
    out("artg") = strings(readResource("art.json"), "terms").map(norm).toArray
    out("terror") = strings(readResource("terror.json"), "terms").map(norm).toArray
    out("tv") = strings(readResource("etv.json"), "terms").map(norm).toArray
    out("gov") = strings(readResource("gov.json"), "terms").map(norm).toArray ++
      strings(readResource("countries.json"), "countries").map(norm) // gov+gpe overlap mirrors librarian.rs:433-455
    out("harm") = strings(readResource("harm.json"), "terms").map(norm).toArray
    out.toMap
  }

  /** entity class → normalized word list (the bert-dict,
    * reference: src/nlu/librarian.rs:457-461; classes per mod.rs:196-250).
    */
  def loadEntityClasses(): Map[String, Array[String]] = {
    val node = readResource("bert-dict.json")
    val classes = Seq("org", "gpe", "person", "money", "art", "product", "loc")
    classes.map(c => c -> strings(node, c).map(norm).toArray).toMap
  }

  /** Per-theme min scores (reference: src/nlu/glossary.rs:330-339;
    * deterministic re-expression per SURVEY.md §7.4 / D2).
    */
  val minScore: Map[String, Int] =
    Map("games" -> 15, "science" -> 9, "harm" -> 5).withDefaultValue(8)
}

/** Compiled, broadcast-able term matcher: inverted token → postings.
  *
  * Replaces the tantivy index + per-term top-10 retrieval
  * (reference: src/nlu/glossary.rs:302-372) with a per-doc scan:
  * score(doc, term) = 8·|matched tokens| + 4 if ALL the term's tokens
  * matched (full-term bonus). A theme fires when its best term score ≥
  * the theme's min score — so default/science themes fire on any full
  * single-token term (12 ≥ 8, 9) while games needs a full multi-token
  * phrase (SURVEY.md §7.4).
  */
final case class Hit(theme: String, word: String, score: Int)

final class TermIndex(val themes: Array[String], termsByTheme: Array[Array[String]])
    extends Serializable {

  // flat term table: (themeIdx, tokens)
  private val termTheme: Array[Int] = {
    val b = new mutable.ArrayBuilder.ofInt
    var t = 0
    while (t < termsByTheme.length) {
      var i = 0
      while (i < termsByTheme(t).length) { b += t; i += 1 }
      t += 1
    }
    b.result()
  }
  private val termTokens: Array[Array[String]] = {
    val b = mutable.ArrayBuffer[Array[String]]()
    termsByTheme.foreach(_.foreach(term => b += term.split(' ')))
    b.toArray
  }
  val termText: Array[String] = termsByTheme.flatten

  // token → term ids containing it
  private val postings: java.util.HashMap[String, Array[Int]] = {
    val tmp = mutable.HashMap[String, mutable.ArrayBuilder.ofInt]()
    var id = 0
    while (id < termTokens.length) {
      termTokens(id).distinct.foreach { tok =>
        tmp.getOrElseUpdate(tok, new mutable.ArrayBuilder.ofInt) += id
      }
      id += 1
    }
    val m = new java.util.HashMap[String, Array[Int]](tmp.size * 2)
    tmp.foreach { case (k, v) => m.put(k, v.result()) }
    m
  }

  /** Best hit per theme for a tokenized, normalized title. */
  def matchTokens(tokens: Array[String]): Map[String, Hit] = {
    if (tokens.isEmpty) return Map.empty
    val tokSet = new java.util.HashSet[String]()
    tokens.foreach(tokSet.add)
    val counts = new java.util.HashMap[Integer, Integer]()
    val it = tokSet.iterator()
    while (it.hasNext) {
      val ids = postings.get(it.next())
      if (ids != null) {
        var i = 0
        while (i < ids.length) {
          counts.merge(ids(i), 1, (a: Integer, b: Integer) => a + b)
          i += 1
        }
      }
    }
    if (counts.isEmpty) return Map.empty
    val best = mutable.HashMap[String, Hit]()
    val e = counts.entrySet().iterator()
    while (e.hasNext) {
      val kv = e.next()
      val id = kv.getKey.intValue()
      val matched = kv.getValue.intValue()
      val full = matched == termTokens(id).length
      val score = 8 * matched + (if (full) 4 else 0)
      val theme = themes(termTheme(id))
      val prev = best.get(theme)
      if (prev.isEmpty || score > prev.get.score ||
          (score == prev.get.score && termText(id) < prev.get.word))
        best(theme) = Hit(theme, termText(id), score)
    }
    best.toMap
  }
}

object TermIndex {
  def apply(dict: Map[String, Array[String]]): TermIndex = {
    val themes = dict.keys.toArray.sorted
    new TermIndex(themes, themes.map(dict))
  }
}
