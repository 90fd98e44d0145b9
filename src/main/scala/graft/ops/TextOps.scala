package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines, over a `documents(doc_id, text, lang, source, n_chars)`
  * table. All SQL-expressible ops are pure Column expressions (whole-stage
  * codegen, no UDFs); the sketch-based ones (minhash/simhash) use seeded
  * deterministic hashing inside codegen-friendly builtins where possible.
  *
  * Scale notes per op are in the Scaladoc — the design constraint is
  * 100 TB / 10^12 rows, so: map-side-combinable aggregations only,
  * bounded per-group state, no driver collects.
  */
object TextOps {

  // ---------- text analysis ------------------------------------------------

  /** Whitespace token count — pure expression, codegen'd. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Cyrillic-vs-Latin script heuristic language id (SQL-expressible twin
    * of graft.lang.LangId for oracle parity; the full detector is the
    * Scala one). Integer arithmetic only — no FP divergence.
    */
  def langIdHeuristic(text: Column): Column = {
    val cyr = length(regexp_replace(text, "[^\\u0400-\\u04FF]", ""))
    val lat = length(regexp_replace(text, "[^A-Za-z]", ""))
    when(cyr * 2 > cyr + lat, lit("ru"))
      .when(lat > 0, lit("en"))
      .otherwise(lit(""))
  }

  /** Quality-score components: length, punctuation count, stopword hits,
    * mean word length ×100 (int). Deterministic, integer-valued.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokenCount(text)
    val punct = length(regexp_replace(text, "[^.!?,;:]", ""))
    // occurrences of "the" as a word = chars removed / 3 (integer-exact,
    // identical in Spark and DuckDB regex engines)
    val stopHits = (length(text) - length(regexp_replace(text, "\\bthe\\b", ""))) / 3
    Seq(
      "n_tokens" -> toks.cast("long"),
      "n_punct" -> punct.cast("long"),
      "stop_hits" -> stopHits.cast("long"),
      "len_per_token_x100" ->
        when(toks > 0, ((length(text) * 100) / toks).cast("long")).otherwise(lit(0L))
    )
  }

  /** Document fingerprint: md5 of lowercased, whitespace-normalized text.
    * md5 is bit-identical across Spark and DuckDB → oracle-checkable.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  // ---------- deduplication ------------------------------------------------

  /** Exact dedup: fingerprint groupBy. Map-side-combinable count + bounded
    * sample of member ids; scales like any hash aggregate (shuffle on the
    * 128-bit key, uniform by construction — no skew handling needed).
    */
  def exactDupGroups(docs: DataFrame, sampleK: Int = 5): DataFrame =
    docs
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(
        count(lit(1)).as("n_dups"),
        slice(sort_array(collect_list(col("doc_id"))), 1, sampleK).as("doc_ids"))
      .filter(col("n_dups") >= 2)

  /** 64-bit FNV-1a over a string column — seeded, stable, expression-only
    * (we avoid xxhash64's Spark-private seed-handling differences by
    * hashing through md5 → first 16 hex chars → long).
    */
  private def stableHash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat_ws("", lit(seed.toString), c)), 1, 15), 16, 10)
      .cast("long")

  /** Word n-gram (shingle) array, lowercased. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    // sliding n-grams via transform over index range
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks),
          concat_ws(" ", slice(toks, i + 1, lit(n)))).otherwise(lit(null))),
      x => x.isNotNull)
  }

  /** MinHash signature (numHashes values) over shingles: per hash i,
    * min over shingles of stableHash64(shingle, i). Pure expressions —
    * array_min over transform — no UDF, no RDD.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => stableHash64(s, i)))
    }: _*)

  /** MinHash+LSH near-dup candidate groups.
    *
    * Pipeline: shingle → minhash(numHashes) → split into `bands` bands of
    * `rows` hashes → explode one row per band → groupBy (band index, band
    * hash) → groups with ≥2 docs are near-dup candidates.
    *
    * Scale: the explode multiplies rows by `bands` (bounded, e.g. 4);
    * the groupBy key is (band, hash-of-rows-hashes) — uniformly
    * distributed, so the shuffle is balanced; per-group state is a bounded
    * sample. Candidate verification (exact Jaccard) joins back only the
    * candidate ids — a tiny fraction at realistic dup rates.
    */
  def minhashDupGroups(docs: DataFrame, shingleN: Int = 3, bands: Int = 4,
                       rowsPerBand: Int = 4, sampleK: Int = 5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = docs
      .select(col("doc_id"),
        minhashSignature(shingles(col("text"), shingleN), numHashes).as("sig"))
      .filter(size(col("sig")) > 0 && !exists(col("sig"), x => x.isNull))
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))
      }: _*)).as("bb"))
    banded
      .groupBy(col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .agg(count(lit(1)).as("n"),
        slice(sort_array(collect_set(col("doc_id"))), 1, sampleK).as("doc_ids"))
      .filter(col("n") >= 2 && size(col("doc_ids")) >= 2)
  }

  /** SimHash (64-bit) over tokens, as a pure aggregate-free expression:
    * for each bit b, sign of Σ_tokens (bit b of hash(token) ? +1 : -1).
    */
  def simhash64(text: Column): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    val hashes = transform(toks, t => stableHash64(t, 0))
    val bits: Seq[Column] = (0 until 64).map { b =>
      val mask = lit(1L << b)
      val ones = size(filter(hashes, h => h.bitwiseAND(mask) =!= 0))
      when(ones * 2 > size(hashes), mask).otherwise(lit(0L))
    }
    bits.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** SimHash near-dup groups: docs sharing the full 64-bit simhash
    * (hamming-0 buckets; banded hamming≤k probing is the scale path —
    * same groupBy shape on band substrings).
    */
  def simhashDupGroups(docs: DataFrame, sampleK: Int = 5): DataFrame =
    docs
      .select(col("doc_id"), simhash64(col("text")).as("sh"))
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("n"),
        slice(sort_array(collect_list(col("doc_id"))), 1, sampleK).as("doc_ids"))
      .filter(col("n") >= 2)

  /** Exact n-gram Jaccard similarity for candidate pairs (verification
    * stage after LSH): pairs with Jaccard ≥ `minJaccard`.
    * Implemented with array_intersect/array_union on distinct shingles.
    * Input: (doc_id_a, doc_id_b) candidate pairs + the docs table.
    */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, shingleN: Int = 3,
                    minJaccard: Double = 0.8): DataFrame = {
    val sh = docs.select(col("doc_id"),
      array_distinct(shingles(col("text"), shingleN)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("sh", "sh_a"), "doc_id_a")
      .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sh", "sh_b"), "doc_id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }
}
