package graft.lang

/** Deterministic language identifier: script ranges + stopword profiles.
  *
  * Replaces the reference's `whatlang::detect` + 18-language exclusion
  * list (reference: src/parser.rs:142-173). Single-label classifier:
  * returns an ISO-639-1-ish code; the pipeline keeps only "en"/"ru"
  * (reference codes per src/printer.rs:10,45). Confusable languages
  * (uk, be, de, fr, es, pt, it, cs, et, lv, id, eo + non-Latin scripts
  * ar, hi, ka, ja, pa, th) are detected so they can be *dropped*, which
  * is all the reference's whitelist needed them for.
  *
  * Deterministic, total, never throws. Operates on any text; callers pass
  * title + leading body text.
  */
object LangId {

  // Stopword profiles: high-frequency function words, disjoint enough for
  // a bag-of-words vote. All-lowercase.
  private val profiles: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "on", "with", "as", "his", "her", "they", "this", "have", "from",
      "are", "be", "at", "by", "not", "but", "had", "has", "were", "which", "an"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "auf", "für", "von", "dem", "den", "des", "im", "sich", "auch",
      "werden", "wurde", "aber", "noch", "nach", "bei", "aus", "wird", "einen"),
    "fr" -> Set("le", "la", "les", "des", "est", "une", "dans", "que", "qui",
      "pour", "pas", "sur", "avec", "son", "par", "plus", "cette", "aux",
      "être", "ont", "mais", "nous", "vous", "comme", "tout", "fait"),
    "es" -> Set("el", "los", "las", "una", "por", "con", "para", "del",
      "está", "pero", "más", "como", "sus", "fue", "ser", "entre", "cuando",
      "muy", "sin", "sobre", "también", "hasta", "hay", "donde", "quien"),
    "pt" -> Set("não", "uma", "com", "para", "mais", "como", "mas", "foi",
      "ele", "das", "tem", "seu", "sua", "ou", "ser", "quando", "muito",
      "nos", "já", "está", "eu", "também", "pelo", "pela", "até", "isso", "são"),
    "it" -> Set("il", "di", "che", "non", "per", "sono", "della", "nel",
      "alla", "più", "anche", "come", "dei", "questo", "gli", "ha", "delle",
      "degli", "essere", "stato", "hanno", "dal", "sul", "era", "loro"),
    "cs" -> Set("je", "se", "na", "to", "že", "by", "jsem", "jako", "ale",
      "tak", "podle", "jeho", "byl", "bylo", "která", "který", "které",
      "jsou", "nebo", "však", "při", "před", "také", "své", "až"),
    "et" -> Set("ja", "on", "ei", "et", "kui", "oli", "ka", "see", "ning",
      "mis", "aga", "oma", "selle", "või", "nagu", "siis", "kes", "üle",
      "välja", "veel", "ole", "seda", "juba", "kus"),
    "lv" -> Set("un", "ir", "ka", "par", "ar", "no", "uz", "tika", "arī",
      "bet", "kas", "tas", "viņš", "lai", "pēc", "gan", "tiek", "šī",
      "savu", "vai", "jau", "bija", "var", "pie"),
    "id" -> Set("yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
      "dalam", "tidak", "akan", "pada", "juga", "ke", "karena", "ada",
      "mereka", "sudah", "saya", "kita", "bisa", "telah", "atau", "oleh"),
    "eo" -> Set("la", "kaj", "de", "en", "estas", "al", "li", "ne", "ke",
      "mi", "kiu", "por", "kun", "sed", "vi", "pri", "povas", "tio",
      "ankaŭ", "ĝi", "estis", "nur", "ili", "se")
  )

  private val ruStops = Set("и", "в", "не", "на", "что", "с", "как", "это",
    "по", "но", "из", "у", "за", "от", "для", "же", "о", "к", "до", "мы",
    "вы", "был", "была", "было", "его", "она", "они", "так", "все", "при")
  private val ukStops = Set("і", "в", "не", "на", "що", "з", "як", "це",
    "та", "до", "про", "за", "від", "для", "же", "у", "він", "вона",
    "також", "або", "його", "був", "була", "було", "більше", "після")
  private val beStops = Set("і", "у", "не", "на", "што", "з", "як", "гэта",
    "па", "але", "да", "пра", "за", "ад", "для", "ж", "ён", "яна",
    "таксама", "або", "яго", "быў", "была", "было", "больш", "пасля")

  // combined word → candidate-language indices (one hash lookup per word
  // instead of a scan over all profiles — this is the detector's hot loop)
  private val latinLangs: Array[String] = profiles.map(_._1)
  private val latinVotes: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, stops), idx) =>
      stops.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }
  private val cyrVotes: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    Seq(ruStops, ukStops, beStops).zipWithIndex.foreach { case (stops, idx) =>
      stops.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }

  private def inRange(c: Char, lo: Int, hi: Int): Boolean = c >= lo && c <= hi

  /** Detect the dominant language of `text`. Returns "" for undetectable. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var latin, cyr, arab, deva, geor, cjk, gurm, thai, total = 0
    var ukChar, beChar = 0
    var i = 0
    val n = math.min(text.length, 4096) // bound work per doc
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        if (c < 0x250) latin += 1
        else if (inRange(c, 0x400, 0x4FF)) {
          cyr += 1
          if (c == 'і' || c == 'ї' || c == 'є' || c == 'ґ') ukChar += 1
          if (c == 'ў') beChar += 1
        }
        else if (inRange(c, 0x600, 0x6FF)) arab += 1
        else if (inRange(c, 0x900, 0x97F)) deva += 1
        else if (inRange(c, 0xA00, 0xA7F)) gurm += 1
        else if (inRange(c, 0xE00, 0xE7F)) thai += 1
        else if (inRange(c, 0x10A0, 0x10FF)) geor += 1
        else if (inRange(c, 0x3040, 0x30FF) || inRange(c, 0x4E00, 0x9FFF)) cjk += 1
      }
      i += 1
    }
    if (total == 0) return ""
    // script gate first (cheap, unambiguous)
    if (arab * 2 > total) return "ar"
    if (deva * 2 > total) return "hi"
    if (gurm * 2 > total) return "pa"
    if (thai * 2 > total) return "th"
    if (geor * 2 > total) return "ka"
    if (cjk * 2 > total) return "ja"
    if (cyr * 2 > total) {
      // ru vs uk vs be: letter evidence then stopword vote
      if (ukChar >= 2 && ukChar > beChar) return "uk"
      if (beChar >= 2) return "be"
      val words = tokenize(text, n)
      val v = new Array[Int](3)
      words.foreach { w =>
        val ls = cyrVotes.get(w)
        if (ls != null) { var i = 0; while (i < ls.length) { v(ls(i)) += 1; i += 1 } }
      }
      if (v(1) > v(0)) return "uk"
      if (v(2) > v(0)) return "be"
      return "ru"
    }
    if (latin * 2 > total) {
      val words = tokenize(text, n)
      val scores = new Array[Int](latinLangs.length)
      words.foreach { w =>
        val ls = latinVotes.get(w)
        if (ls != null) { var i = 0; while (i < ls.length) { scores(ls(i)) += 1; i += 1 } }
      }
      var best = -1; var bestScore = 0
      var p = 0
      while (p < scores.length) {
        // strict > preserves first-profile-wins tie-breaking of the scan form
        if (scores(p) > bestScore) { bestScore = scores(p); best = p }
        p += 1
      }
      if (bestScore == 0) return "" // latin but no profile evidence → drop
      return latinLangs(best)
    }
    ""
  }

  private def tokenize(text: String, upto: Int): Array[String] = {
    val b = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < upto) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) sb.append(Character.toLowerCase(c))
      else if (sb.length > 0) { b += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) b += sb.toString
    b.toArray
  }
}
