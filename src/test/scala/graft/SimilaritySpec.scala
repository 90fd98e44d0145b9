package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("q_id"), col("embedding"))

  /** every query vector is in the corpus → rank 1 must be itself, sim≈1 */
  private def assertSelfTop1(df: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val top1 = df.filter(col("rank") === 1)
      .select(col("q_id"), col("vec_id"), col("sim"))
      .as[(Long, Long, Double)].collect()
    assert(top1.nonEmpty)
    top1.foreach { case (q, v, s) =>
      assert(q == v, s"query $q: top-1 was $v")
      assert(math.abs(s - 1.0) < 1e-5)
    }
  }

  test("brute-force top-k: self is rank 1, k results per query") {
    import spark.implicits._
    val r = Similarity.bruteForceTopK(spark, emb, queries, k = 5).cache()
    assertSelfTop1(r)
    val perQ = r.groupBy(col("q_id")).count().as[(Long, Long)].collect()
    assert(perQ.forall(_._2 == 5))
  }

  test("LSH-bucketed top-k: self is rank 1 (same bucket trivially)") {
    assertSelfTop1(Similarity.lshBucketTopK(spark, emb, queries, k = 5, nBits = 6))
  }

  test("multi-probe LSH: self is rank 1 and recall ≥ single-probe") {
    import spark.implicits._
    val multi = Similarity.lshMultiProbeTopK(spark, emb, queries, k = 5, nBits = 8)
    assertSelfTop1(multi)
    // recall vs brute-force truth, compared against single-probe
    val truth = Similarity.bruteForceTopK(spark, emb, queries, k = 5)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val single = Similarity.lshBucketTopK(spark, emb, queries, k = 5, nBits = 8)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val multiSet = multi.select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert((multiSet & truth).size >= (single & truth).size)
  }

  test("IVF top-k: self is rank 1 (own centroid always probed)") {
    assertSelfTop1(Similarity.ivfTopK(spark, emb, queries, k = 5))
  }

  test("zip_with/aggregate cosine expression equals the kernel") {
    import spark.implicits._
    val pairs = emb.limit(10).select(col("vec_id"), col("embedding"))
      .crossJoin(emb.limit(10).select(col("vec_id").as("v2"), col("embedding").as("e2")))
    val viaExpr = pairs
      .select(col("vec_id"), col("v2"),
        Similarity.cosineExpr(col("embedding"), col("e2")).as("sim"))
      .as[(Long, Long, Double)].collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val vecs = emb.limit(10).select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    vecs.foreach { case (a, ea) =>
      vecs.foreach { case (b, eb) =>
        val kernel = {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          ea.indices.foreach { i =>
            dot += ea(i).toDouble * eb(i); na += ea(i).toDouble * ea(i); nb += eb(i).toDouble * eb(i)
          }
          dot / math.sqrt(na * nb)
        }
        // zip_with multiplies in float before widening → ~1e-7 drift
        assert(math.abs(viaExpr((a, b)) - kernel) < 1e-6)
      }
    }
  }
}
