package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also materializes the extraction pipeline's per-doc BASE tables to
  * `$outDir/_base/{classified,entities,spans}` so the ext_* oracles can
  * recompute their relational tails in DuckDB over the same rows (the
  * extraction/classify kernels are fixture-checked in `sbt test`; the
  * external oracle covers the groupBy/window/explode tails). Oracle SQL
  * may reference the dump dir via the `{OUT}` placeholder, substituted
  * here with the absolute path.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // base tables for the ext_* oracles (written before the queries run).
    // extractedCachedFor/classifiedFor are the steady-state persisted
    // datasets the ext_* queries below reuse — ONE extract+classify pass
    // feeds the base tables AND every query (VERDICT r2 item 1).
    val ext = SparkEntry.extractedCachedFor(spark, sfDir)
    val classified = SparkEntry.classifiedFor(spark, sfDir).toDF()
    classified
      .select(col("doc_id"), col("lang"), col("title_norm"),
        col("category"), col("is_news"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/classified")
    classified
      .select(col("doc_id"), explode(col("entities")).as(Seq("class", "words")))
      .select(col("doc_id"), col("class"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/entities")
    ext.toDF()
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind").as("kind"),
        col("span.media_ref").as("media_ref"), col("span.offset").as("offset"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/spans")

    // PDF-leg base tables: generation is a pure function of (seed, idx),
    // so this dump and the pdf_* queries see byte-identical corpora
    val pdfExt = SparkEntry.pdfExtractedCachedFor(spark, sfDir).toDF()
    // (persisted — the same dataset the pdf_* queries below consume)
    pdfExt.select(col("doc_id"), col("lang"), col("title_norm"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/pdf_extracted")
    pdfExt.select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind").as("kind"), col("span.offset").as("offset"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/pdf_spans")

    // clustering-key bases: DuckDB re-derives the near (simhash-band
    // groupBy) and fuzzy (CC over verified title pairs) thread tails
    graft.threads.Threads.nearKeyed(classified)
      .select(col("cluster_key"), col("title_norm"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/near_keyed")
    val fuzzyTitles = graft.threads.Threads.fuzzyTitles(classified)
    fuzzyTitles.select(col("tid"), col("title_norm"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/title_tid")
    graft.threads.Threads.fuzzyVerifiedPairs(fuzzyTitles)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/fuzzy_pairs")

    // sketch-kernel base tables over the documents table: the hash
    // kernels run here once; DuckDB re-derives the relational tails
    // (banding/grouping/sampling/jaccard/CC) from these rows
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.ops.Sketches.minhashBanded(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/minhash_banded")
    graft.ops.Sketches.simhashTable(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/simhash")
    graft.ops.Sketches.shingleTable(docs)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/shingles")
    SparkEntry.ngramCandPairs(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/jaccard_cand")
    SparkEntry.neardupPairsFor(spark, sfDir) // same memo the queries share
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/neardup_pairs")
    graft.ops.Multimodal.extractMeta(graft.ops.Multimodal.mediaTable(docs)).toDF()
      .select(col("doc_id"), col("kind"), col("frames"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/media_meta")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.ops.Similarity.signBanded(spark, emb)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/emb_banded")
    graft.ops.Similarity.sigTable(spark, emb, nBits = 6)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/ann_sig6")
    graft.ops.Similarity.sigTable(spark, emb, nBits = 8)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/ann_sig8")
    // the SAME persisted trained index the ann_ivf_topk query searches
    val (ivfAssign, ivfProbes) = SparkEntry.ivfFor(spark, sfDir)
    ivfAssign.select(col("vec_id"), col("cid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/ivf_assign")
    ivfProbes.select(col("q_id"), col("cid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_base/ivf_probes")

    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = Paths.get(outDir).toAbsolutePath.normalize.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
