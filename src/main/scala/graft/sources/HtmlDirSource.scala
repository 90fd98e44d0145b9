package graft.sources

import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source for the reference's native input format: a directory tree of
  * HTML files (reference: visit_dirs, src/parser.rs:50-108). Spark's
  * binaryFile source replaces the 200-thread recursive walk — file
  * listing is distributed and the reader yields (path, bytes) splits.
  * Each file becomes one Doc: doc_id = path, a single html input span.
  *
  * A reference user points this at the same directory they pass to
  * `tgnews <verb> <dir>` and gets the engine's Dataset[Doc].
  */
object HtmlDirSource {

  def read(spark: SparkSession, dir: String,
           glob: String = ""): Dataset[Doc] = {
    import spark.implicits._
    // no default glob: the reference parses every file regardless of
    // extension (visit_dirs, src/parser.rs:90-103) — contest corpora use
    // bare file names; pass a glob only to opt in to filtering
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    (if (glob.nonEmpty) reader.option("pathGlobFilter", glob) else reader)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val html = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        Doc(path, Array(Span("html", html, "", 0)))
      }
  }
}
