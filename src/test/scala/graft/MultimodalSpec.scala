package graft

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("meta extraction: deterministic, one row per media, kinds cycle") {
    import spark.implicits._
    val meta = Multimodal.extractMeta(Multimodal.mediaTable(docs)).collect()
    assert(meta.length == 500)
    meta.foreach { m =>
      assert(Seq("image", "audio", "video").contains(m.kind))
      assert(m.kind == Seq("image", "audio", "video")((m.doc_id % 3).toInt))
      assert(m.width >= 64 && m.height >= 64)
      assert(m.kind != "video" || m.frames >= 1)
    }
    // deterministic across runs
    val again = Multimodal.extractMeta(Multimodal.mediaTable(docs)).collect()
    assert(meta.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("resize stub: bounded box, payload shrinks, header carries dims") {
    import spark.implicits._
    val resized = Multimodal.resizeStub(Multimodal.mediaTable(docs), 128, 128).collect()
    resized.foreach { r =>
      assert(r.width <= 128 && r.height <= 128 && r.width >= 1)
      val hw = ((r.payload(0) & 0xff) << 8) | (r.payload(1) & 0xff)
      assert(hw == r.width)
    }
  }

  test("frame-sample plan fans out via explode, stride respected") {
    import spark.implicits._
    val meta = Multimodal.extractMeta(Multimodal.mediaTable(docs))
    val plan = Multimodal.frameSamplePlan(meta, stride = 30)
      .as[(Long, Long)].collect()
    assert(plan.nonEmpty)
    plan.groupBy(_._1).foreach { case (_, rows) =>
      val idxs = rows.map(_._2).sorted
      assert(idxs.head == 0)
      idxs.sliding(2).filter(_.length == 2).foreach(p => assert(p(1) - p(0) == 30))
    }
  }
}
