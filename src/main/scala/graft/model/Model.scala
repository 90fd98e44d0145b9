package graft.model

/** Core data model for the extraction engine.
  *
  * The input shape is the `input_hint` contract (BASELINE.json): an
  * Iceberg-layout table of interleaved text+media documents,
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  * Input span kinds are `"html"` (raw HTML bytes in `text`) and `"media"`
  * (an out-of-band media reference). Output span kinds are
  * `"text" | "image" | "embed"` with `offset` = 0-based emission order.
  *
  * This generalizes the reference's per-file doc record `{h1, path, lang}`
  * (reference: src/parser.rs:184-188) to a typed, columnar-friendly schema.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One input document: interleaved raw-HTML chunks and media references. */
final case class Doc(doc_id: String, spans: Array[Span])

/** One extracted document (the pipeline's main intermediate/output row).
  *
  * Mirrors FIXTURES.md §2. `lang` codes follow the reference's printer
  * ("en"/"ru", reference: src/printer.rs:10,45); docs in any other language
  * are dropped before this record exists (reference: src/parser.rs:150-173).
  */
final case class ExtractedDoc(
    doc_id: String,
    lang: String,
    title_norm: String,
    spans: Array[Span],
    n_text_spans: Int,
    n_media_spans: Int
)

/** ExtractedDoc after glossary/entity enrichment (reference: the per-path
  * merged JSON of src/nlu/glossary.rs:107-146, here plain typed columns).
  */
final case class ClassifiedDoc(
    doc_id: String,
    lang: String,
    title_norm: String,
    category: String, // society|economy|technology|sports|entertainment|science|other|""
    is_news: Boolean,
    entities: Map[String, Array[String]]
)

/** A news thread/cluster (reference: src/nlu/glossary.rs:238-259). */
final case class NewsThread(
    title: String,
    category: String,
    articles: Array[String],
    size: Int
)
