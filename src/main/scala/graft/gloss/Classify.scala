package graft.gloss

import graft.extract.TitleKey
import graft.model.{ClassifiedDoc, ExtractedDoc}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/** Category rule cascade — first-match-wins, exactly the reference's rule
  * order (reference: src/nlu/glossary.rs:152-214):
  *
  *   society        (gpe|gov|terror|harm|org) && (org|corp|money|person|art|loc)
  *   economy        money && (corp|tech|person|art|org|gpe|loc)
  *   technology     tech|product|corp
  *   sports         sports
  *   entertainment  !harm && (games|music|book|tv) && !(gov|gpe|money|terror)
  *   science        science|medicine
  *   fallthrough    org|gpe|person|gov|tech|corp → "other", else "" (not news)
  *
  * is_news := one of the six categories fired (reference: glossary.rs:207-209).
  */
object CategoryRules {

  val NewsCategories: Seq[String] =
    Seq("society", "economy", "technology", "sports", "entertainment", "science")

  def categorize(f: String => Boolean): String = {
    if ((f("gpe") || f("gov") || f("terror") || f("harm") || f("org")) &&
        (f("org") || f("corp") || f("money") || f("person") || f("art") || f("loc")))
      "society"
    else if (f("money") &&
        (f("corp") || f("tech") || f("person") || f("art") || f("org") || f("gpe") || f("loc")))
      "economy"
    else if (f("tech") || f("product") || f("corp")) "technology"
    else if (f("sports")) "sports"
    else if (!f("harm") && (f("games") || f("music") || f("book") || f("tv")) &&
        !(f("gov") || f("gpe") || f("money") || f("terror")))
      "entertainment"
    else if (f("science") || f("medicine")) "science"
    else if (f("org") || f("gpe") || f("person") || f("gov") || f("tech") || f("corp"))
      "other"
    else ""
  }
}

/** Glossary/entity enrichment + categorization stage.
  *
  * One mapPartitions over the extracted Dataset with two broadcast
  * matchers (themes + entity classes) — the broadcast-join replacement for
  * the reference's tantivy retrieval loop (SURVEY.md §1.3, C2/C3/C4).
  * No shuffle.
  */
object Classify {

  final case class Dicts(themes: TermIndex, entities: TermIndex)

  def loadDicts(): Dicts =
    Dicts(TermIndex(Glossary.loadThemes()), TermIndex(Glossary.loadEntityClasses()))

  def classifyOne(doc: ExtractedDoc, dicts: Dicts): ClassifiedDoc = {
    val toks = TitleKey.tokens(doc.title_norm)
    val themeHits = dicts.themes.matchTokens(toks)
      .filter { case (theme, hit) => hit.score >= Glossary.minScore(theme) }
    val entityHits = dicts.entities.matchTokens(toks)
      .filter { case (_, hit) => hit.score >= 8 }
    // flags: union of glossary themes and entity classes; "art" fires from
    // either the art glossary or the art entity class (reference merges
    // both into one JSON object, glossary.rs:127-146)
    def flag(name: String): Boolean = name match {
      case "art" => entityHits.contains("art") || themeHits.contains("artg")
      case "org" | "gpe" | "person" | "money" | "product" | "loc" =>
        entityHits.contains(name)
      case t => themeHits.contains(t)
    }
    val category = CategoryRules.categorize(flag)
    ClassifiedDoc(
      doc_id = doc.doc_id,
      lang = doc.lang,
      title_norm = doc.title_norm,
      category = category,
      is_news = CategoryRules.NewsCategories.contains(category),
      entities = entityHits.map { case (cls, hit) => cls -> Array(hit.word) }
    )
  }

  def run(extracted: Dataset[ExtractedDoc], bc: Broadcast[Dicts]): Dataset[ClassifiedDoc] = {
    import extracted.sparkSession.implicits._
    extracted.mapPartitions { it =>
      val dicts = bc.value
      it.map(classifyOne(_, dicts))
    }
  }
}
