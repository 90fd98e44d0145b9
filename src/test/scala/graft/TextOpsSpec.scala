package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with GenChecks {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("tokenDocFreq: plain count ≡ countDistinct(doc_id) when doc_id is the key") {
    import spark.implicits._
    // planted exact-dup TEXTS under DISTINCT ids (the sf1 dup shape),
    // repeated tokens within a doc, case/whitespace noise, an empty doc —
    // df must count DOCUMENTS (array_distinct collapses within-doc
    // repeats), and the one-shuffle count form must equal the
    // distinct-aggregation form exactly (each (doc_id, token) survives
    // the explode once because doc_id is unique)
    val docs = ((0L until 40L).map(i => (i, s"alpha beta beta tok$i  ALPHA")) ++
      (40L until 50L).map(i => (i, "the same dup text body")) ++
      Seq((50L, ""), (51L, "alpha")))
      .toDF("doc_id", "text")
    val fast = TextOps.tokenDocFreq(docs, minDf = 2)
      .as[(String, Long)].collect().toMap
    val distinctForm = docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(trim(col("text"))), "\\s+"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .as[(String, Long)].collect().toMap
    assert(fast == distinctForm)
    // spot values: "alpha" appears once per doc 0-39 despite ALPHA/alpha
    // within-doc repeats, plus doc 51
    assert(fast("alpha") == 41L)
    assert(fast("dup") == 10L)
    assert(!fast.contains("tok3")) // df=1 < minDf
    // and the plan actually lost the distinct aggregation: exactly one
    // Exchange (on token), no expand/two-phase distinct
    val plan = TextOps.tokenDocFreq(docs, minDf = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("contaminationHits: 13-gram overlap vs probes, self-hits excluded, brute-force checked") {
    import spark.implicits._
    val w = (0 until 40).map(i => s"tok$i") // 40 shared tokens
    val probeText = w.mkString(" ")
    val rows = Seq(
      (0L, probeText),                               // probe (0 % 97 == 0)
      (1L, probeText),                               // full copy: all grams hit
      (2L, w.drop(20).mkString(" ") + " tail xyz"),  // 20-token suffix overlap → 8 grams
      (3L, w.take(12).mkString(" ")),                // < 13 tokens: no grams at all
      (4L, (0 until 40).map(i => s"other$i").mkString(" ")), // disjoint vocabulary
      (5L, probeText.toUpperCase),                   // case-folded: still hits
      // tab-prefixed copy: trim strips SPACES only (both engines), so
      // the tab survives and yields a leading EMPTY token — full-window
      // grams still align from token 1 on (28 hits like the full copy)
      (6L, "\t" + probeText)
    )
    val docs = rows.toDF("doc_id", "text")
    val probes = docs.filter($"doc_id" % 97 === 0)
    val got = TextOps.contaminationHits(docs, probes, n = 13)
      .as[(Long, Long)].collect().toMap
    // brute-force reference mirroring the kernel's exact semantics:
    // space-only trim, Locale.ROOT lowercase, \s+ split with empties KEPT
    def grams(t0: String): Set[String] = {
      val t = t0.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
      if (toks.length < 13) Set.empty
      else toks.sliding(13).map(_.mkString(" ")).toSet
    }
    val probeGrams = grams(probeText)
    val expect = rows.collect { case (id, t) if id != 0L =>
      id -> (grams(t) & probeGrams).size.toLong
    }.filter(_._2 > 0).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(got(1L) == 28L && got(2L) == 8L && got(5L) == 28L && got(6L) == 28L)
    assert(!got.contains(0L), "probe's self-hits excluded")
    assert(!got.contains(3L) && !got.contains(4L))
    // scale shape: the benchmark-sized probe side broadcasts — the corpus
    // gram stream must not shuffle for the join
    val contaminated = TextOps.contaminationHits(docs, probes, n = 13)
    contaminated.collect()
    assert(contaminated.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // hashed production twin (VERDICT r7 item 5): exact agreement, same
    // broadcast plan shape, and the join payload is LONGS — no gram
    // string crosses the broadcast
    val hashed = TextOps.contaminationHitsHashed(docs, probes, n = 13)
    assert(hashed.as[(Long, Long)].collect().toMap == got)
    hashed.collect()
    val hp = hashed.queryExecution.executedPlan.toString
    assert(hp.contains("BroadcastHashJoin"), hp.take(2000))
    val joinLine = hp.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    joinLine.foreach(l => assert(l.contains("gh") && !l.contains("gram#"), l))
  }

  test("sourceCap: k smallest doc_ids per source, WindowGroupLimit in the plan") {
    import spark.implicits._
    // a hot source (40 docs), a small source (2), an exactly-k source (3)
    val docs = ((0L until 40L).map(i => (i, s"text $i", "hot")) ++
      Seq((100L, "a", "small"), (101L, "b", "small"),
        (200L, "x", "exact"), (201L, "y", "exact"), (202L, "z", "exact")))
      .toDF("doc_id", "text", "source")
    val capped = TextOps.sourceCap(docs, k = 3)
    val got = capped.as[(Long, String)].collect().toSet
    val expect = (0L until 3L).map((_, "hot")).toSet ++
      Set((100L, "small"), (101L, "small"),
        (200L, "exact"), (201L, "exact"), (202L, "exact"))
    assert(got == expect)
    // the rank filter must optimize to a group limit (partial map-side
    // prune before the shuffle — the hot-domain skew defense)
    assert(capped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"), capped.queryExecution.executedPlan.toString)
  }

  test("property: contaminationHits and sourceCap match brute force on random corpora") {
    import spark.implicits._
    // random corpora from a SMALL shared vocabulary so cross-doc 13-gram
    // collisions actually occur, doc lengths straddling the n=13 boundary
    // (0..30 tokens), multi-space/case noise
    val tokG = Gen.oneOf((0 until 6).map(i => s"w$i"))
    val docG = for {
      len <- Gen.choose(0, 30)
      toks <- Gen.listOfN(len, tokG)
      upper <- Gen.oneOf(true, false)
      sep <- Gen.oneOf(" ", "  ")
    } yield {
      val s = toks.mkString(sep)
      if (upper) s.toUpperCase else s
    }
    val corpusG = Gen.choose(5, 25).flatMap(n => Gen.listOfN(n, docG))
    samples(corpusG, 8).zipWithIndex.foreach { case (texts, ci) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = rows.toDF("doc_id", "text")
      val probes = docs.filter($"doc_id" % 3 === 0)
      def grams(t0: String): Set[String] = {
        // mirror the kernel exactly: space-only trim, ROOT lowercase,
        // \s+ split with empties kept (vacuous for space-separated input)
        val t = t0.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val toks = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
        if (toks.length < 13) Set.empty
        else toks.sliding(13).map(_.mkString(" ")).toSet
      }
      val probeGramsByDoc = rows.filter(_._1 % 3 == 0)
        .map { case (id, t) => id -> grams(t) }
      val expect = rows.map { case (id, t) =>
        val hits = grams(t).filter(g =>
          probeGramsByDoc.exists { case (pid, pg) => pid != id && pg.contains(g) })
        id -> hits.size.toLong
      }.filter(_._2 > 0).toMap
      val got = TextOps.contaminationHits(docs, probes, n = 13)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"corpus $ci: got $got expect $expect\n$rows")
      // hashed twin agrees exactly on every random corpus
      val gotHashed = TextOps.contaminationHitsHashed(docs, probes, n = 13)
        .as[(Long, Long)].collect().toMap
      assert(gotHashed == expect, s"corpus $ci hashed: got $gotHashed expect $expect")
      // sourceCap vs brute force on a skewed random source assignment
      val withSrc = rows.map { case (id, t) => (id, t, s"s${id % 3 % 2}") }
        .toDF("doc_id", "text", "source")
      val k = 2
      val capExpect = rows.map(_._1).groupBy(id => s"s${id % 3 % 2}")
        .flatMap { case (src, ids) => ids.sorted.take(k).map(id => (id, src)) }.toSet
      val capGot = TextOps.sourceCap(withSrc, k).as[(Long, String)].collect().toSet
      assert(capGot == capExpect, s"corpus $ci sourceCap")
    }
  }
}
