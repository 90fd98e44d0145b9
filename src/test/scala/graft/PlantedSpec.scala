package graft

import graft.ops.TextOps
import graft.synth.Planted
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the planted-fixture contract (VERDICT r7 item 1): the rows
  * SparkEntry unions into documents/customer to make doc_exact_dedup,
  * doc_decontaminate and q6_antijoin non-vacuous at every tier. The
  * invariants here are exactly what keeps the union SAFE for the other
  * 44 queries (which read the raw tables) and lockstep with the DuckDB
  * VALUES literal generated from the same constants.
  */
class PlantedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("constants: id ranges, probe residue, SQL-literal safety") {
    val ids = Planted.docs.map(_._1)
    assert(ids.distinct.size == ids.size)
    // far above any tier's real doc_id range, within INT32 for the
    // DuckDB VALUES literal side
    assert(ids.forall(id => id >= 960000000L && id <= Int.MaxValue.toLong))
    // exactly ONE planted probe: the designated one
    assert(ids.filter(_ % 97 == 0) == Seq(Planted.probeId))
    // quote/backslash-free single-spaced texts → safe as SQL literals,
    // and trim/split-stable on both engines
    Planted.docs.map(_._2).foreach { t =>
      assert(!t.contains("'") && !t.contains("\\") && !t.contains("\""))
      assert(t == t.trim && !t.contains("  "))
    }
    // exact-dup texts are gram-free (< 13 tokens): they cannot perturb
    // decontamination; contamination texts are pairwise distinct: they
    // cannot add exact-dup groups
    Planted.exactDups.map(_._2).foreach(t => assert(t.split(" ").length < 13))
    val ct = Planted.contamination.map(_._2)
    assert(ct.distinct.size == ct.size)
    assert(Planted.custkeys.forall(_ < 0L)) // no order key is negative
  }

  test("pii constants: id ranges, literal safety, one of each pattern shape") {
    val ids = Planted.pii.map(_._1)
    assert(ids.distinct.size == ids.size)
    // same range contract as docs: above every tier's real id range,
    // within INT32 for the DuckDB VALUES literal
    assert(ids.forall(id => id >= 960000000L && id <= Int.MaxValue.toLong))
    // disjoint from the decontamination/dedup fixture ids — the sets
    // union into DIFFERENT queries and must never alias
    assert((ids.toSet & Planted.docs.map(_._1).toSet).isEmpty)
    Planted.pii.map(_._2).foreach { t =>
      assert(!t.contains("'") && !t.contains("\\") && !t.contains("\""))
      assert(t == t.trim && !t.contains("  "))
    }
    // the four rows cover exactly the four pattern shapes: email-only,
    // numbers-only, both, neither (the negative control)
    val shapes = Planted.pii.map { case (_, t) =>
      (TextOps.PiiEmailPattern.r.findFirstIn(t).isDefined,
        TextOps.PiiNumPattern.r.findFirstIn(t).isDefined)
    }
    assert(shapes.toSet == Set((true, false), (false, true), (true, true), (false, false)),
      shapes.toString)
  }

  test("line constants: id ranges, per-line literal safety, shared-line structure") {
    val ids = Planted.lines.map(_._1)
    assert(ids.distinct.size == ids.size)
    // same range contract: above every tier's real id range, within
    // INT32 for the DuckDB VALUES literal
    assert(ids.forall(id => id >= 960000000L && id <= Int.MaxValue.toLong))
    // disjoint from the other fixture sets — the sets union into
    // DIFFERENT queries and must never alias
    assert((ids.toSet & (Planted.docs.map(_._1) ++ Planted.pii.map(_._1)).toSet).isEmpty)
    // the safety pins apply per LINE (texts contain real newlines by
    // design — legal verbatim inside a DuckDB string literal); the
    // zzline prefix keeps planted lines disjoint from every single-line
    // corpus text, so no real doc's scrub outcome can shift
    val lineRows = Planted.lines.map { case (id, t) => id -> t.split("\n", -1).toSeq }
    lineRows.flatMap(_._2).foreach { l =>
      assert(!l.contains("'") && !l.contains("\\") && !l.contains("\""))
      assert(l == l.trim && !l.contains("  ") && l.startsWith("zzline"))
    }
    // structure: at least one line shared by >= 2 docs (the op's positive
    // case) and at least one doc with NO shared line (negative control)
    val byLine = lineRows.flatMap { case (id, ls) => ls.distinct.map(l => (l, id)) }
      .groupBy(_._1).map { case (l, g) => l -> g.map(_._2).distinct.size }
    assert(byLine.values.exists(_ >= 2))
    val shared = byLine.filter(_._2 >= 2).keySet
    assert(lineRows.exists { case (_, ls) => ls.forall(!shared.contains(_)) })
  }

  test("planted lines produce the designed scrub outcomes") {
    import spark.implicits._
    val got = TextOps.lineDedup(Planted.lines.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(990000001L) == (3L, 2L, "zzline unique alpha one"))
    assert(got(990000002L) == (3L, 2L, "zzline unique beta two"))
    assert(got(990000003L) == (2L, 1L, "zzline unique gamma three"))
    assert(got(990000004L) ==
      (2L, 0L, "zzline all unique row\nzzline another unique row"))
  }

  test("planted docs produce the designed exact-dup groups and contamination hits") {
    import spark.implicits._
    val docs = Planted.docs.toDF("doc_id", "text")
    val groups = TextOps.exactDupGroups(docs)
      .select(col("n_dups")).as[Long].collect().sorted.toSeq
    assert(groups == Seq(2L, 3L), s"expected dup groups of 2 and 3, got $groups")
    val hits = TextOps.contaminationHits(docs, docs.filter($"doc_id" % 97 === 0))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(970000001L -> 1L, 970000002L -> 2L), hits.toString)
    // the hashed production twin agrees on the planted fixtures
    // (VERDICT r7 item 5 done-criterion)
    val hashed = TextOps.contaminationHitsHashed(docs, docs.filter($"doc_id" % 97 === 0))
      .as[(Long, Long)].collect().toMap
    assert(hashed == hits, hashed.toString)
  }
}
