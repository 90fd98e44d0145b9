package graft.pdf

import graft.extract.Extract
import graft.model.ExtractedDoc
import org.apache.spark.sql.Dataset

/** PDF → [[ExtractedDoc]]: the PDF twin of `Extract.run` — one typed
  * mapPartitions over (doc_id, pdf bytes), sharing [[Extract.gate]]
  * (language whitelist + title normalization) with the HTML path so both
  * formats land in the SAME record shape and every downstream stage
  * (classify, threads, top, dedup) is format-agnostic. No shuffle: a
  * narrow scan→map stage exactly like HTML extraction.
  */
object PdfExtract {

  def extractOne(docId: String, pdf: Array[Byte]): Option[ExtractedDoc] = {
    if (pdf == null || pdf.isEmpty) return None
    val res = PdfScanner.extract(pdf)
    Extract.gate(res).map { case (lang, titleNorm) =>
      ExtractedDoc(
        doc_id = docId,
        lang = lang,
        title_norm = titleNorm,
        spans = res.spans,
        n_text_spans = res.spans.count(_.kind == "text"),
        n_media_spans = res.spans.count(s => s.kind == "image" || s.kind == "embed"))
    }
  }

  def run(pdfs: Dataset[(String, Array[Byte])]): Dataset[ExtractedDoc] = {
    import pdfs.sparkSession.implicits._
    pdfs.mapPartitions(_.flatMap { case (id, bytes) => extractOne(id, bytes) })
  }
}
