package graft.synth

import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic interleaved corpus (FIXTURES.md §3).
  *
  * Every doc is a pure function of (seed, index) — generation is
  * partition-count-invariant, so local[8] and local[32] benches see
  * byte-identical input (SURVEY.md §7.7.4). The generator is the span
  * ORACLE: it records the ground-truth extracted span sequence as it
  * assembles the HTML, so fixtures never depend on the extractor.
  *
  * Mix (mirrors the reference's accepted/dropped behavior,
  * src/parser.rs:142-173): ~45% en, ~30% ru, ~15% confusable languages
  * (de/fr/es/uk — must be dropped), ~5% no-<h1> (dropped, Q9),
  * ~5% boilerplate-only/empty (dropped).
  */
object Synth {

  /** Ground truth for one generated doc. */
  final case class Truth(
      doc_id: String,
      input: Array[Span],
      kept: Boolean,
      lang: String, // expected output lang when kept
      title_norm: String,
      expected: Array[Span], // expected extracted spans when kept
      story: Int, // ≥0 when doc belongs to a shared-title story group
      topic: String
  )

  // ---- deterministic RNG ----------------------------------------------
  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() & Long.MaxValue
      (r % bound).toInt
    }
    def pick[T](xs: Array[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  // ---- vocab -----------------------------------------------------------
  private val enStop = Array("the", "and", "of", "to", "in", "is", "that",
    "it", "was", "for", "on", "with", "as", "this", "have", "from", "are",
    "be", "at", "by")
  private val enWord = Array("market", "police", "government", "election",
    "storm", "season", "victory", "crisis", "report", "deal", "launch",
    "study", "film", "album", "match", "protest", "budget", "trial",
    "rocket", "virus", "summit", "strike", "record", "award", "treaty")
  private val enEntity = Array("arsenal", "liverpool", "chelsea", "yankees",
    "lakers", "apple", "microsoft", "google", "amazon", "tesla", "boeing",
    "france", "germany", "russia", "china", "ukraine", "congress",
    "senate", "dollar", "billion", "johnson", "smith", "macron",
    "vaccine", "telescope", "asteroid", "smartphone", "satellite")

  private val ruStop = Array("и", "в", "не", "на", "что", "с", "как", "это",
    "по", "но", "из", "у", "за", "от", "для", "же", "о", "к", "до", "мы")
  private val ruWord = Array("рынок", "полиция", "правительство", "выборы",
    "шторм", "сезон", "победа", "кризис", "доклад", "сделка", "запуск",
    "фильм", "альбом", "матч", "протест", "бюджет", "суд", "ракета",
    "вирус", "саммит", "рекорд", "награда", "договор")
  private val ruEntity = Array("спартак", "зенит", "динамо", "газпром",
    "сбербанк", "россия", "франция", "германия", "китай", "доллар",
    "миллиард", "путин", "макрон", "вакцина", "телескоп", "спутник")

  private val deWords = Array("der", "die", "das", "und", "ist", "nicht",
    "eine", "mit", "auf", "für", "von", "regierung", "wahl", "markt",
    "polizei", "bericht", "saison", "sieg", "krise", "vertrag")
  private val frWords = Array("le", "la", "les", "des", "est", "une",
    "dans", "que", "pour", "avec", "gouvernement", "élection", "marché",
    "police", "rapport", "saison", "victoire", "crise", "budget", "traité")
  private val esWords = Array("el", "los", "las", "una", "por", "con",
    "para", "del", "gobierno", "elección", "mercado", "policía",
    "informe", "temporada", "victoria", "crisis", "presupuesto", "tratado")
  private val ukWords = Array("і", "в", "не", "на", "що", "з", "як", "це",
    "та", "до", "про", "від", "його", "уряд", "вибори", "ринок",
    "поліція", "звіт", "сезон", "перемога", "криза", "бюджет", "україна")

  private val topics = Array("sports", "economy", "technology", "society",
    "entertainment", "science")

  /** ~2k REAL dictionary terms planted sparsely (8% of standalone en
    * titles) so the classify stage sees corpus-RARE matches: the BM25-idf
    * gate (SURVEY §7.4) needs df/N ≲ e^-8 for a single token to fire, so
    * the round-1 scheme of a 28-word entity vocab (df ≈ 5%) can never
    * clear it — exactly as the reference's tantivy scoring wouldn't.
    * Deterministic: sorted glossary order, fixed strides. Loaded lazily
    * once per JVM from the same resources the classifier broadcasts.
    */
  lazy val plantPool: Array[String] = {
    val ascii = "^[a-z0-9 ]+$".r
    val themes = graft.gloss.Glossary.loadThemes()
    val multi = themes.toSeq.sortBy(_._1)
      .flatMap(_._2.sorted)
      .filter(t => t.contains(' ') && t.length <= 40 && ascii.matches(t))
      .distinct
    val ents = graft.gloss.Glossary.loadEntityClasses()
    val singles = ents.toSeq.sortBy(_._1)
      .flatMap(_._2.sorted)
      .filter(t => !t.contains(' ') && t.length >= 5 && ascii.matches(t))
      .distinct
    val strideM = math.max(1, multi.size / 1536)
    val strideS = math.max(1, singles.size / 512)
    (multi.grouped(strideM).map(_.head).take(1536) ++
      singles.grouped(strideS).map(_.head).take(512)).toArray
  }

  /** Cyrillic twin of [[plantPool]] for ru titles (the bert-dict carries
    * ~thousands of Russian tokens across its entity classes).
    */
  lazy val plantPoolRu: Array[String] = {
    val cyr = "^[а-яё0-9 ]+$".r
    val ents = graft.gloss.Glossary.loadEntityClasses()
    val singles = ents.toSeq.sortBy(_._1)
      .flatMap(_._2.sorted)
      .filter(t => !t.contains(' ') && t.length >= 5 && cyr.matches(t))
      .distinct
    val stride = math.max(1, singles.size / 512)
    singles.grouped(stride).map(_.head).take(512).toArray
  }

  private val imgHosts = Array("https://img.example.com/", "https://cdn.example.org/",
    "https://static.example.net/")
  private val embedHosts = Array("https://video.example.com/embed/",
    "https://player.example.org/v/")

  // ---- doc assembly ----------------------------------------------------

  private def words(rng: Rng, stop: Array[String], word: Array[String],
                    entity: Array[String], n: Int, entityEvery: Int): String = {
    val b = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      if (i > 0) b.append(' ')
      if (entityEvery > 0 && i % entityEvery == entityEvery - 1) b.append(rng.pick(entity))
      else if (i % 2 == 0) b.append(rng.pick(stop))
      else b.append(rng.pick(word))
      i += 1
    }
    b.toString
  }

  /** Multi-token glossary terms for story titles: a hot story's term
    * tokens have df ≈ thread size (20-30), idf ≈ 5-6 each — a SINGLE
    * token never clears the 8-gate at these corpus sizes, but a 2+-token
    * term sums past it, exactly how the reference's hot stories carry
    * categories ("boston bruins …" scores 2 × idf).
    */
  lazy val plantPoolMulti: Array[String] = plantPool.filter(_.contains(' '))

  /** Deterministic shared story title for (story group, lang). */
  def storyTitle(seed: Long, group: Int, lang: String): String = {
    val rng = new Rng(fnv64(s"$seed:story:$group:$lang"))
    if (lang == "ru") {
      // two rare ru bert tokens sum past the gate → ru stories carry
      // entity flags (→ society et al.), mirroring the en multi-token path
      if (rng.chance(40))
        s"${rng.pick(plantPoolRu)} ${rng.pick(plantPoolRu)} ${rng.pick(ruWord)}"
      else
        s"${rng.pick(ruEntity)} ${rng.pick(ruStop)} ${rng.pick(ruWord)} ${rng.pick(ruWord)}"
    } else {
      if (rng.chance(40))
        s"${rng.pick(plantPoolMulti)} ${rng.pick(enStop)} ${rng.pick(enWord)}"
      else
        s"${rng.pick(enEntity)} ${rng.pick(enStop)} ${rng.pick(enWord)} ${rng.pick(enWord)}"
    }
  }

  /** Generate one doc + its ground truth. Pure in (seed, idx). */
  def gen(seed: Long, idx: Long, nStories: Int): Truth = {
    val docId = f"doc-$idx%012d"
    val rng = new Rng(fnv64(s"$seed:$docId"))
    val roll = rng.nextInt(100)

    val html = new java.lang.StringBuilder(2048)
    val expected = new scala.collection.mutable.ArrayBuffer[Span](16)
    // html position (at emission time) per expected span — lets the chunk
    // splitter interleave input-level media at exact source positions
    val srcPos = new scala.collection.mutable.ArrayBuffer[Int](16)
    def addText(t: String): Unit = { expected += Span("text", t, "", 0); srcPos += html.length }
    def addImage(alt: String, ref: String): Unit = { expected += Span("image", alt, ref, 0); srcPos += html.length }
    def addEmbed(ref: String): Unit = { expected += Span("embed", "", ref, 0); srcPos += html.length }

    // boilerplate-only / empty doc → dropped
    if (roll >= 95) {
      html.append("<html><head><title>x</title></head><body><nav><a href=\"/\">home</a>")
        .append("<a href=\"/b\">news</a></nav><footer>© example</footer></body></html>")
      return Truth(docId, Array(Span("html", html.toString, "", 0)),
        kept = false, "", "", Array.empty, -1, "")
    }

    val (lang, kept0) =
      if (roll < 45) ("en", true)
      else if (roll < 75) ("ru", true)
      else if (roll < 90) (Array("de", "fr", "es", "uk").apply(rng.nextInt(4)), false)
      else ("en", false) // no-h1 case below

    val noH1 = roll >= 90 && roll < 95
    val topic = rng.pick(topics)
    val story = if (kept0 && !noH1 && rng.chance(30)) rng.nextInt(nStories) else -1

    val (stop, word, entity) = lang match {
      case "ru" => (ruStop, ruWord, ruEntity)
      case "de" => (deWords, deWords, deWords)
      case "fr" => (frWords, frWords, frWords)
      case "es" => (esWords, esWords, esWords)
      case "uk" => (ukWords, ukWords, ukWords)
      case _    => (enStop, enWord, enEntity)
    }

    val title =
      if (story >= 0) storyTitle(seed, story, lang)
      else if (kept0 && !noH1 && lang == "en" && rng.chance(8))
        // planted real-glossary term (corpus-rare → clears the idf gate)
        s"${rng.pick(plantPool)} ${rng.pick(enWord)} ${rng.pick(enStop)} ${rng.pick(enWord)}"
      else if (kept0 && !noH1 && lang == "ru" && rng.chance(8))
        s"${rng.pick(plantPoolRu)} ${rng.pick(ruWord)} ${rng.pick(ruStop)} ${rng.pick(ruWord)}"
      else words(rng, stop, word, entity, 4 + rng.nextInt(4), 3)

    // head + header/nav boilerplate (skipped by the emitter)
    html.append("<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>")
      .append(title).append("</title><script>var x=1;</script></head><body>")
    html.append("<header><nav><a href=\"/\">home</a> <a href=\"/news\">news</a> ")
      .append("<a href=\"/sport\">sport</a></nav></header>")

    // optional early <h1> (multi-h1: last wins, src/parser.rs:138-140)
    if (!noH1 && rng.chance(10)) {
      val early = words(rng, stop, word, entity, 3, 0)
      html.append("<h1>").append(early).append("</h1>")
      addText(early)
    }

    html.append("<article>")
    if (!noH1) {
      html.append("<h1>").append(title).append("</h1>")
      addText(title)
    }

    // body paragraphs with inline markup, links, occasional entity refs
    val nPara = 2 + rng.nextInt(6)
    val mediaIns = new scala.collection.mutable.ArrayBuffer[Int](2) // para idx after which an input-level media span goes
    var p = 0
    while (p < nPara) {
      val n = 8 + rng.nextInt(14)
      val txt = words(rng, stop, word, entity, n, 5)
      val variant = rng.nextInt(10)
      if (variant < 2) {
        // inline <b> inside the paragraph — same visible text
        val cut = txt.indexOf(' ', txt.length / 2)
        if (cut > 0) {
          val (a, b) = (txt.substring(0, cut), txt.substring(cut + 1))
          html.append("<p>").append(a).append(" <b>").append(b).append("</b></p>")
        } else html.append("<p>").append(txt).append("</p>")
        addText(txt)
      } else if (variant < 4) {
        // short link inside a long paragraph (kept: link density ≤ 1/3)
        html.append("<p>").append(txt).append(" <a href=\"/more\">more</a></p>")
        addText(txt + " more")
      } else {
        html.append("<p>").append(txt).append("</p>")
        addText(txt)
      }
      if (rng.chance(20)) {
        // link-farm paragraph → must be DROPPED by link-density rule
        html.append("<p><a href=\"/x1\">click here now</a> <a href=\"/x2\">read this too</a></p>")
      }
      if (rng.chance(15)) {
        val ref = rng.pick(imgHosts) + java.lang.Long.toHexString(rng.nextLong() & 0xffffffffL) + ".jpg"
        val alt = words(rng, stop, word, entity, 3, 0)
        html.append("<figure><img src=\"").append(ref).append("\" alt=\"").append(alt)
          .append("\"></figure>")
        addImage(alt, ref)
      }
      if (rng.chance(8)) {
        val ref = rng.pick(embedHosts) + java.lang.Long.toHexString(rng.nextLong() & 0xffffffffL)
        html.append("<iframe src=\"").append(ref).append("\"></iframe>")
        addEmbed(ref)
      }
      if (rng.chance(12)) mediaIns += html.length // cut position for an interleaved media input span
      p += 1
    }
    html.append("</article>")
    // sidebar + footer boilerplate
    html.append("<aside><ul><li><a href=\"/t1\">trending one</a></li>")
      .append("<li><a href=\"/t2\">trending two</a></li></ul></aside>")
    html.append("<footer><p>© example news network</p></footer></body></html>")

    val full = html.toString
    val kept = kept0 && !noH1

    // split into interleaved input spans: html chunks + kind=media spans at
    // body-paragraph boundaries (input media become `image` output spans at
    // their interleaved positions)
    val input = new scala.collection.mutable.ArrayBuffer[Span](4)
    if (mediaIns.isEmpty || !kept) {
      input += Span("html", full, "", 0)
      if (!kept0 || noH1) {
        return Truth(docId, input.toArray, kept = false, "", "", Array.empty, -1, "")
      }
    } else {
      // split the html at the recorded cut positions; a kind=media input
      // span goes between the chunks
      var last = 0
      var off = 0
      mediaIns.zipWithIndex.foreach { case (cut, mi) =>
        input += Span("html", full.substring(last, cut), "", off); off += 1
        val mrng = new Rng(fnv64(s"$seed:$docId:media:$mi"))
        val ref = "media://" + java.lang.Long.toHexString(mrng.nextLong())
        val alt = words(mrng, stop, word, entity, 3, 0)
        input += Span("media", alt, ref, off); off += 1
        last = cut
      }
      if (last < full.length) { input += Span("html", full.substring(last), "", off); off += 1 }
    }

    // interleave input media into the expected sequence by source position
    val finalExpected: Array[Span] =
      if (mediaIns.isEmpty || !kept) {
        expected.iterator.zipWithIndex.map { case (s, i) => s.copy(offset = i) }.toArray
      } else {
        val out = new scala.collection.mutable.ArrayBuffer[Span](expected.length + mediaIns.length)
        var ei = 0
        var ii = 0 // index into input: walk to keep media order aligned with cuts
        var mi = 0
        mediaIns.foreach { cut =>
          while (ei < expected.length && srcPos(ei) <= cut) {
            out += expected(ei).copy(offset = out.length); ei += 1
          }
          // the mi-th media input span
          val m = input(2 * mi + 1) // html,media alternate: media at odd slots until the tail chunk
          out += Span("image", m.text, m.media_ref, out.length)
          mi += 1; ii += 2
        }
        while (ei < expected.length) { out += expected(ei).copy(offset = out.length); ei += 1 }
        out.toArray
      }

    if (!kept)
      Truth(docId, input.toArray, kept = false, "", "", Array.empty, -1, "")
    else
      Truth(docId, input.toArray, kept = true, lang,
        graft.extract.TitleKey.normTitle(title), finalExpected, story, topic)
  }

  /** Build the input Dataset[Doc] at a scale factor. sf 0.001 ≈ 1k docs. */
  def corpus(spark: SparkSession, seed: Long, nDocs: Long,
             partitions: Int = 32): Dataset[Doc] = {
    import spark.implicits._
    val nStories = math.max(8, (nDocs / 50).toInt)
    spark.range(0, nDocs, 1, partitions)
      .mapPartitions(_.map(i => { val t = gen(seed, i, nStories); Doc(t.doc_id, t.input) }))
  }

  /** Fused generate+extract in ONE mapPartitions (no Doc encoder
    * round-trip). Chaining corpus() into Extract.run crosses a
    * SerializeFromObject/DeserializeToObject boundary per doc whose cost
    * was measured to dominate AND anti-scale with cores (2.7s@8 → 4.0s@32
    * for 400k docs, vs 2.2s → 0.9s fused); for parquet input the single
    * boundary is unavoidable and scales fine. Results are identical to
    * Extract.run(corpus(...)) — asserted by PipelineSpec.
    */
  def extracted(spark: SparkSession, seed: Long, nDocs: Long,
                partitions: Int = 32): Dataset[graft.model.ExtractedDoc] = {
    import spark.implicits._
    val nStories = math.max(8, (nDocs / 50).toInt)
    spark.range(0, nDocs, 1, partitions)
      .mapPartitions(_.flatMap { i =>
        val t = gen(seed, i, nStories)
        graft.extract.Extract.extractOne(Doc(t.doc_id, t.input))
      })
  }

  /** Ground-truth Dataset for fixture assertions. */
  def truths(spark: SparkSession, seed: Long, nDocs: Long,
             partitions: Int = 32): Dataset[Truth] = {
    import spark.implicits._
    val nStories = math.max(8, (nDocs / 50).toInt)
    spark.range(0, nDocs, 1, partitions)
      .mapPartitions(_.map(i => gen(seed, i, nStories)))
  }
}
