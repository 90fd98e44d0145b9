package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch aggregates (the 100 TB substitutes for exact
  * distinct/percentile): accuracy within advertised bounds on real data.
  */
class SketchAccuracySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HLL approx_count_distinct within 5% of exact on corpus tokens") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
    val row = toks.agg(
      countDistinct(col("token")).as("exact"),
      approx_count_distinct(col("token"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("percentile_approx within 2% of exact discrete percentile") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"$approx vs $exact")
  }

  import graft.ops.Sketches

  /** deterministic mildly-varied doc texts: i-th doc perturbs a base. */
  private def docText(i: Int): String = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    s"$base token$i marker${i % 7} extra${i % 13}"
  }

  test("simhash near pairs: candidate volume ignores duplicate multiplicity (adversarial 50% identical)") {
    import spark.implicits._
    // corpus A: 200 varied docs; corpus B: the same 200 PLUS one doc
    // repeated 200× (a templated boilerplate page = the hot-bucket bomb).
    // The de-quadratic candidate stage runs over DISTINCT signatures, so
    // its row count must be IDENTICAL for A and B — duplicate multiplicity
    // contributes zero candidate work (VERDICT r2 item 2 done-criterion).
    val varied = (0 until 200).map(i => (i.toLong, docText(i)))
    val boiler = "identical boilerplate template page words here"
    val dupes = (200 until 400).map(i => (i.toLong, boiler))
    val b = (varied ++ dupes).toDF("doc_id", "text")
    val bOne = (varied :+ (200L, boiler)).toDF("doc_id", "text")
    def candCount(docs: org.apache.spark.sql.DataFrame): Long =
      Sketches.simhashSigPairs(Sketches.simhashTable(docs), bands = 4, maxHamming = 3).count()
    // exact invariant: 200 copies of the template generate EXACTLY the
    // same candidate volume as 1 copy — multiplicity is invisible to the
    // band join (the round-2 form blew up O(copies²) right here)
    assert(candCount(b) == candCount(bOne))
    // and the doc-level PAIR OUTPUT (inherently quadratic for degenerate
    // input) is still exactly right: 200 identical docs = C(200,2) pairs
    val pairs = Sketches.simhashNearDupPairs(b).filter($"id_a" >= 200 && $"id_b" >= 200).count()
    assert(pairs == 200L * 199 / 2)
  }

  test("size-ratio prefilter is lossless: verified pairs identical, candidate set strictly smaller") {
    import spark.implicits._
    // titles of strongly varying token counts sharing a common base —
    // the fuzzy-thread shape (shingleN=1): same-size near-dups must
    // survive, cross-size candidates whose count ratio already rules out
    // Jaccard ≥ 0.5 must be dropped BEFORE the verify joins
    val docs = (0 until 300).map { i =>
      val base = "alpha beta gamma delta"
      val extra = (0 until (i % 12)).map(k => s"w${i % 5}x$k").mkString(" ")
      (i.toLong, if (extra.isEmpty) base else s"$base $extra")
    }.toDF("doc_id", "text")
    val unf = Sketches.minhashCandidatePairs(docs, shingleN = 1, bands = 4, rowsPerBand = 2)
    val fil = Sketches.minhashCandidatePairs(docs, shingleN = 1, bands = 4, rowsPerBand = 2,
      sizeRatioMinJaccard = 0.5)
    val unfSet = unf.as[(Long, Long)].collect().toSet
    val filSet = fil.as[(Long, Long)].collect().toSet
    // soundness: the filter only ever REMOVES candidates…
    assert(filSet.subsetOf(unfSet))
    // …and it actually fires on this corpus (everything is deterministic
    // — fnv/mix kernels, no RNG — so this inequality is stable)
    assert(filSet.size < unfSet.size, s"${filSet.size} vs ${unfSet.size}")
    // losslessness: the verify stage output is IDENTICAL either way
    def verify(cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Sketches.jaccardVerify(docs, cand, shingleN = 1, minJaccard = 0.5)
        .select($"doc_id_a", $"doc_id_b").as[(Long, Long)].collect().toSet
    val vU = verify(unf)
    assert(vU == verify(fil))
    assert(vU.nonEmpty) // the equality is not vacuous
    // every dropped candidate is provably unverifiable: ratio < j ⇒ J < j
    val cnts = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").distinct.length }.toMap
    (unfSet -- filSet).foreach { case (a, b) =>
      val r = math.min(cnts(a), cnts(b)).toDouble / math.max(cnts(a), cnts(b))
      assert(r < 0.5, s"dropped pair ($a,$b) had ratio $r")
    }
  }

  test("inline-verify pairs ≡ join-form candidate+verify pairs (title shape)") {
    import spark.implicits._
    // the fuzzy-thread corpus shape: short token sets, including a hot
    // bucket of identical titles (anchor-star must match exactly) and
    // near-dups that pass/fail the 0.5 Jaccard cutoff both ways
    val docs = ((0 until 260).map { i =>
      val base = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      val toks = base.take(2 + i % 4) ++ Seq(s"t${i % 9}", s"u${i % 23}")
      (i.toLong, toks.mkString(" "))
    } ++ (260 until 300).map(i => (i.toLong, "hot bucket identical title words")))
      .toDF("doc_id", "text")
    val joinForm = Sketches.jaccardVerify(docs,
        Sketches.minhashCandidatePairs(docs, shingleN = 1, bands = 4, rowsPerBand = 2),
        shingleN = 1, minJaccard = 0.5)
      .select($"doc_id_a", $"doc_id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val inline = Sketches.minhashVerifiedPairsInline(docs, shingleN = 1,
        bands = 4, rowsPerBand = 2, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // exact set equality INCLUDING the jaccard value (same division over
    // the same .distinct.sorted hash arrays) — the fuzzy-thread tail and
    // its DuckDB oracle both hang off this identity
    assert(inline == joinForm)
    assert(inline.size > 50, s"non-vacuous: ${inline.size}") // hot bucket alone is C(40+,2)-ish via CC later
  }

  test("verified pairs match a driver-side brute-force Jaccard oracle (document shape)") {
    import spark.implicits._
    // the DOCUMENT near-dup shape: multi-sentence texts (shingleN=3,
    // unbounded shingle sets), heavy-tailed lengths so the size-ratio
    // bound fires, a hot bucket of identical docs, and borderline
    // near-dups on both sides of the 0.5 Jaccard cutoff
    val rows = ((0 until 220).map { i =>
      val base = (0 until 8 + i % 25).map(k => s"w${(k + i % 7) % 31}").mkString(" ")
      val tail = (0 until i % 6).map(k => s"extra${i % 11}x$k").mkString(" ")
      (i.toLong, if (tail.isEmpty) base else s"$base $tail")
    } ++ (220 until 250).map(i =>
      (i.toLong, "the same templated boilerplate page body repeated verbatim across mirrors")))
    val docs = rows.toDF("doc_id", "text")
    val cand = Sketches.minhashCandidatePairs(docs, shingleN = 3,
      sizeRatioMinJaccard = 0.5)
    val candSet = cand.as[(Long, Long)].collect().toSet
    // independent reference: the same kernel's shingle sets, but the
    // jaccard computed per pair ON THE DRIVER with plain set arithmetic —
    // any plan-shape change to jaccardVerify (join order, gating, pins)
    // must reproduce these exact values
    val shsBy = rows.map { case (id, t) =>
      id -> Sketches.shingleHashes(t, 3).toSet
    }.toMap
    val oracle = candSet.flatMap { case (a, b) =>
      val (sa, sb) = (shsBy(a), shsBy(b))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      if (j >= 0.5) Some((a, b, j)) else None
    }
    val verified = Sketches.jaccardVerify(docs, cand, shingleN = 3, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // exact set equality INCLUDING jaccard values — nearDupPairs (and
    // Verify's neardup_pairs base table / DuckDB recursive-CTE oracle)
    // hang off this identity
    assert(verified == oracle)
    assert(verified.nonEmpty)
    assert(verified.exists(_._3 < 1.0), "non-vacuous: borderline pairs present")
  }

  test("simhash near pairs equal the brute-force hamming closure") {
    import spark.implicits._
    val docs = (0 until 120).map(i => (i.toLong, docText(i / 3))).toDF("doc_id", "text")
    val got = Sketches.simhashNearDupPairs(docs)
      .select($"id_a", $"id_b", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the signature table (pigeonhole: maxHamming=3 < 4
    // bands guarantees every qualifying pair shares a band)
    val sh = Sketches.simhashTable(docs).as[(Long, Long)].collect()
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
