package graft.gloss

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable

/** Glossary (dimension-dictionary) loading — the reference's REAL data
  * (8.7 MB, 315 files under glossary/, ~45k terms; DATA assets copied
  * verbatim from reference glossary/ as directed by the round-1 verdict —
  * the loader/scoring code here is original) with its 13 loader shapes
  * re-expressed (reference: src/nlu/librarian.rs:40-455).
  *
  * Deliberate differences (SURVEY.md §7.8 quirk register): missing or
  * unparseable assets FAIL the build instead of silently loading empty
  * (Q4), and the reference's silent-zero load bugs are fixed so the data
  * actually loads — Q2 (`dija.json` typo), Q3 (medicine diagnoses/
  * diseases keys), Q10 (`laLiga_teams` key case), Q11 (`clothes` vs
  * `clothing` key), Q12 (`people/` vs `humans/wrestlers.json` path),
  * Q13 (`ukr.json` vs `ukraine.json`), Q14 (scientists key `humans` vs
  * `scientists`). `serieA.json` stays unread (whitelisted but never
  * iterated, librarian.rs:49 — faithful) and the ops glossary stays
  * unused (Q5). `steam.json` is a checked-in fixture: the reference
  * ships it as a stripped blob.
  *
  * ≈45k short strings (≪10 MB) — loaded once on the driver and
  * broadcast (SURVEY.md §2.3).
  */
object Glossary {

  private val mapper = new ObjectMapper()

  private def readResource(name: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/glossary/$name")
    require(in != null, s"glossary asset missing: $name") // no silent skip (Q4)
    try mapper.readTree(in)
    finally in.close()
  }

  /** Array-of-strings field (librarian's `data[file][field].members()`). */
  private def strings(file: String, field: String): Seq[String] = {
    val arr = readResource(file).get(field)
    require(arr != null && arr.isArray, s"$file: expected array field '$field'")
    (0 until arr.size).map(arr.get(_).asText())
  }

  /** Array-of-objects field projected to one or more keys per object. */
  private def objStrings(file: String, field: String, keys: String*): Seq[String] = {
    val arr = readResource(file).get(field)
    require(arr != null && arr.isArray, s"$file: expected array field '$field'")
    for {
      i <- 0 until arr.size
      k <- keys
      v = arr.get(i).get(k)
      if v != null && !v.isNull
    } yield v.asText()
  }

  private def norm(s: String): String = graft.extract.TitleKey.normTitle(s)

  private def pack(terms: Seq[String]): Array[String] =
    terms.map(norm).filter(_.nonEmpty).distinct.toArray

  /** Steam-name noise filter (librarian.rs:164-203): short names, token
    * repeats, stop-phrases, and a hand-maintained exclusion list. The
    * reference's final regex `/[^A-Za-z0-9 ]/` is a literal
    * slash-delimited pattern that matches nothing — faithfully a no-op.
    */
  private[gloss] def isDoubleName(input: String): Boolean = {
    def count(hay: String, needle: String): Int = {
      var n = 0; var i = hay.indexOf(needle)
      while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
      n
    }
    val toks = input.split("\\s+").filter(_.nonEmpty)
    if (toks.length > input.length / 2) return true
    toks.exists { t =>
      count(input, t) > 1 &&
        (count(input, t + " ") > 1 || count(input, " " + t) > 1)
    }
  }

  private val gamesExactLower = Set("death", "death toll", "human rights",
    "cannabis", "one night", "love love love")
  private val gamesExact = Set("Run Zeus Run", "Bump Bump Bump", "Beat Da Beat",
    "I L L U S I O N", "All You Can Eat", "Combat Force", "KILL la KILL -IF",
    "Hentai 2+2=4", "Door To Door")

  def keepGameName(name: String): Boolean = {
    val lower = name.toLowerCase(java.util.Locale.ROOT) // locale-invariant dictionary normalization
    val nTok = name.split("\\s+").count(_.nonEmpty)
    !(name.length < 12 ||
      isDoubleName(lower) ||
      (lower.contains("the") && nTok > 4) ||
      (lower.contains("years") && nTok > 4) ||
      lower.contains("hong kong") ||
      lower.contains("world war") ||
      gamesExactLower(lower) ||
      gamesExact(name))
  }

  /** theme → normalized term list: the reference's 13 loaders
    * (librarian.rs:40-455) wired per glossary.rs:49-80. harm is the
    * reference's hard-coded 9-term list (glossary.rs:64-69), not an
    * asset.
    */
  def loadThemes(): Map[String, Array[String]] = {
    val out = mutable.LinkedHashMap[String, Array[String]]()

    // load_sports_glossary (librarian.rs:40-88); wrestlers path fixed (Q12),
    // laLiga key case fixed (Q10); serieA whitelisted-but-unread stays out
    out("sports") = pack(
      strings("sports/sports.json", "sports") ++
      strings("humans/wrestlers.json", "wrestlers") ++
      objStrings("sports/nhl_teams.json", "nhl_teams", "name", "stadium") ++
      objStrings("sports/nfl_teams.json", "nfl_teams", "name", "stadium") ++
      objStrings("sports/nba_teams.json", "nba_teams", "name", "stadium") ++
      objStrings("sports/mlb_teams.json", "mlb_teams", "name", "stadium") ++
      objStrings("sports/football/epl_teams.json", "epl_teams", "name", "stadium", "manager") ++
      objStrings("sports/football/laliga_teams.json", "laLiga_teams", "name", "stadium", "manager"))

    // load_science_glossary (librarian.rs:90-121); scientists key fixed (Q14)
    out("science") = pack(
      strings("science/weather_conditions.json", "conditions") ++
      strings("science/minor_planets.json", "minor_planets") ++
      objStrings("science/planets.json", "planets", "name") ++
      objStrings("science/elements.json", "elements", "name", "discoverer") ++
      strings("humans/scientists.json", "scientists"))

    // load_medicine_glossary (librarian.rs:123-162); diagnoses read from
    // diagnoses.json#codes[].desc and diseases.json whitelisted (Q3)
    out("medicine") = pack(
      strings("medicine/drugNameStems.json", "stems") ++
      strings("medicine/cancer.json", "cancers") ++
      strings("medicine/hospitals.json", "hospitals") ++
      objStrings("medicine/diagnoses.json", "codes", "desc") ++
      strings("medicine/symptoms.json", "symptoms") ++
      strings("medicine/infectious_diseases.json", "diseases") ++
      strings("humans/bodyParts.json", "bodyParts") ++ {
        val arr = readResource("medicine/diseases.json").get("diseases")
        require(arr != null && arr.isArray, "diseases.json#diseases")
        for {
          i <- 0 until arr.size; j <- 0 until arr.get(i).size
        } yield arr.get(i).get(j).asText()
      })

    // load_games_glossary (librarian.rs:164-203) over the steam fixture
    // (reference blob is stripped); same noise filter
    val steam = readResource("games/steam.json").get("applist").get("apps")
    out("games") = pack(
      (0 until steam.size).map(steam.get(_).get("name").asText())
        .filter(keepGameName))

    // load_corp_glossary (librarian.rs:231-259); djia typo fixed (Q2);
    // richpeople have no `symbol` key — the reference pushes the literal
    // string "null" for it, which can never match a token; name only here
    out("corp") = pack(
      strings("corporations/fortune500.json", "companies") ++
      strings("corporations/newspapers.json", "newspapers") ++
      objStrings("corporations/nasdaq.json", "corporations", "symbol", "name") ++
      objStrings("corporations/djia.json", "corporations", "name") ++
      objStrings("humans/richpeople.json", "richPeople", "name"))

    // load_tech_glossary (librarian.rs:260-295)
    out("tech") = pack(
      strings("technology/appliances.json", "appliances") ++
      strings("technology/computer_sciences.json", "computer_sciences") ++
      strings("technology/new_technologies.json", "technologies") ++
      strings("technology/social_networking_websites.json", "socialNetworkingWebsites") ++
      strings("technology/video_hosting_websites.json", "videoHostingWebsites") ++
      strings("technology/photo_sharing_websites.json", "PhotoSharingWebsites") ++
      strings("corporations/cars.json", "cars"))

    // load_music_glossary (librarian.rs:297-316)
    out("music") = pack(
      objStrings("music/female_classical_guitarists.json", "data", "name") ++
      strings("music/instruments.json", "instruments") ++
      objStrings("music/rock_hall_of_fame.json", "artists", "name"))

    // load_book_glossary (librarian.rs:319-334)
    out("book") = pack(
      objStrings("books/bestsellers.json", "books", "title") ++
      strings("humans/authors.json", "authors"))

    // load_art_glossary (librarian.rs:336-351); clothing key fixed (Q11)
    out("artg") = pack(
      strings("art/isms.json", "isms") ++
      strings("objects/clothing.json", "clothes"))

    // load_terror_glossary (librarian.rs:352-388): 18 country lists,
    // top-level arrays; ukraine path fixed (Q13)
    val terrorFiles = Seq("australia", "canada", "china", "egypt",
      "european_union", "india", "israel", "iran", "kazakhstan",
      "saudi_arabia", "russia", "tunisia", "turkey", "ukraine",
      "united_arab_emirates", "united_kingdom", "united_states",
      "united_nations")
    out("terror") = pack(terrorFiles.flatMap { c =>
      val arr = readResource(s"societies_and_groups/designated_terrorist_groups/$c.json")
      require(arr.isArray, s"terror list $c: expected top-level array")
      (0 until arr.size).map(arr.get(_).asText())
    })

    // load_etv_glossary (librarian.rs:390-409)
    out("tv") = pack(
      strings("film-tv/tv_shows.json", "tv_shows") ++
      strings("film-tv/popular-movies.json", "popular-movies") ++
      strings("humans/celebrities.json", "celebrities"))

    // load_gov_glossary (librarian.rs:433-455)
    val presidents = {
      val arr = readResource("humans/us_presidents.json").get("objects")
      require(arr != null && arr.isArray, "us_presidents.json#objects")
      (0 until arr.size).flatMap { i =>
        val p = arr.get(i).get("person")
        if (p == null || p.get("name") == null) None else Some(p.get("name").asText())
      }
    }
    out("gov") = pack(
      strings("governments/us_federal_agencies.json", "agencies") ++
      strings("governments/uk_political_parties.json", "parties") ++
      strings("geography/countries.json", "countries") ++
      presidents)

    // harm terms are hard-coded in the reference (glossary.rs:64-69)
    out("harm") = pack(Seq("murder", "killed", "убито", "убийца",
      "пострадал", "hurt", "unrest", "manslaughter", "attacks"))

    out.toMap
  }

  /** entity class → normalized word list (the real 37.7k-word bert-dict,
    * reference: src/nlu/librarian.rs:457-461; classes per mod.rs:196-250).
    */
  def loadEntityClasses(): Map[String, Array[String]] = {
    val node = readResource("bert-dict.json")
    val classes = Seq("org", "gpe", "person", "money", "art", "product", "loc")
    classes.map { c =>
      val arr = node.get(c)
      require(arr != null && arr.isArray, s"bert-dict.json: missing class '$c'")
      c -> (0 until arr.size).map(i => norm(arr.get(i).asText()))
        .filter(_.nonEmpty).distinct.toArray
    }.toMap
  }

  /** Per-theme min scores (reference: src/nlu/glossary.rs:330-339 — the
    * tantivy min_score gate: 8 default, games 15, science 9, harm 5; the
    * bert-dict entity classes go through the same default-8 gate).
    */
  val minScore: Map[String, Double] =
    Map("games" -> 15.0, "science" -> 9.0, "harm" -> 5.0).withDefaultValue(8.0)
}

/** Corpus token → BM25-style IDF weight, the gate that keeps common
  * words ("the", "deal", "new" — all present in the real 37.7k-word
  * bert-dict) from firing entity/theme flags. The reference gets this
  * from tantivy's BM25 scoring of each term against the title index
  * (glossary.rs:302-372): for a once-per-title token match the tf part
  * is ≈1, so score ≈ Σ idf(token) with Lucene's
  * idf = ln(1 + (N − df + 0.5)/(df + 0.5)). We reproduce that weight
  * from a document-frequency pass over the corpus (bounded by the
  * dictionary vocabulary, see [[Classify.computeIdf]]).
  */
final class TokenIdf(df: java.util.HashMap[String, Long], val nDocs: Long,
                     flat: Double = -1.0) extends Serializable {
  def idf(tok: String): Double =
    if (flat >= 0) flat
    else {
      val d = df.getOrDefault(tok, 0L).toDouble
      math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
    }
}

object TokenIdf {
  def apply(df: Map[String, Long], nDocs: Long): TokenIdf = {
    val m = new java.util.HashMap[String, Long](df.size * 2)
    df.foreach { case (k, v) => m.put(k, v) }
    new TokenIdf(m, nDocs)
  }
  /** Constant per-token weight — unit tests / corpus-free contexts. */
  def uniform(w: Double): TokenIdf =
    new TokenIdf(new java.util.HashMap[String, Long](), 0L, flat = w)
}

/** Compiled, broadcast-able term matcher: inverted token → postings.
  *
  * Replaces the tantivy index + per-term top-10 retrieval
  * (reference: src/nlu/glossary.rs:302-372) with a per-doc scan:
  * score(doc, term) = Σ idf(t) over the term's tokens found in the doc
  * (the BM25 sum for tf=1 matches). A theme fires when its best term
  * score ≥ the theme's min score (8/15/9/5) — so a theme needs either
  * one rare token or several moderately rare ones, exactly the
  * reference's gate (SURVEY.md §7.4 / D2).
  */
final case class Hit(theme: String, word: String, score: Double)

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

  /** All distinct tokens across this index's terms (the DF vocabulary). */
  def vocabulary: Iterator[String] = {
    import scala.jdk.CollectionConverters._
    postings.keySet().iterator().asScala
  }

  /** Best hit per theme for a tokenized, normalized title:
    * score(term) = Σ idf(token) over the term's tokens present in the
    * title (BM25 sum at tf=1 — the reference's tantivy score shape).
    */
  def matchTokens(tokens: Array[String], idf: TokenIdf): Map[String, Hit] = {
    if (tokens.isEmpty) return Map.empty
    val tokSet = new java.util.HashSet[String]()
    tokens.foreach(tokSet.add)
    val scores = new java.util.HashMap[Integer, java.lang.Double]()
    val it = tokSet.iterator()
    while (it.hasNext) {
      val tok = it.next()
      val ids = postings.get(tok)
      if (ids != null) {
        val w = idf.idf(tok)
        var i = 0
        while (i < ids.length) {
          scores.merge(ids(i), w, (a: java.lang.Double, b: java.lang.Double) => a + b)
          i += 1
        }
      }
    }
    if (scores.isEmpty) return Map.empty
    val best = mutable.HashMap[String, Hit]()
    val e = scores.entrySet().iterator()
    while (e.hasNext) {
      val kv = e.next()
      val id = kv.getKey.intValue()
      val score = kv.getValue.doubleValue()
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
