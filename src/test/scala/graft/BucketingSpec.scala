package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bucketing = pre-shuffled storage: a table bucketed by the grouping key
  * aggregates with NO Exchange (the co-located-join/agg strategy the
  * 100 TB layout relies on — cluster once at write time, reuse the
  * partitioning across every downstream job).
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("groupBy on the bucket column has no Exchange; unbucketed does") {
    import spark.implicits._
    val docs = (0 until 1000).map(i => (f"t${i % 97}%03d", f"doc$i%04d")).toDF("title_norm", "doc_id")
    // the suite may share a session whose warehouse dir differs from this
    // spec's config — drop any prior table AND its location first
    spark.sql("DROP TABLE IF EXISTS classified_bucketed")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "classified_bucketed")
    if (loc.exists) { def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(loc) }
    docs.write.mode("overwrite")
      .bucketBy(8, "title_norm").sortBy("title_norm")
      .saveAsTable("classified_bucketed")
    val bucketed = spark.table("classified_bucketed")
      .groupBy($"title_norm").agg(count(lit(1)).as("n"))
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    // sanity: same query over plain parquet DOES shuffle
    val dir = Files.createTempDirectory("plain").toString
    docs.write.mode("overwrite").parquet(dir)
    val plain = spark.read.parquet(dir)
      .groupBy($"title_norm").agg(count(lit(1)).as("n"))
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    // and both agree
    val a = bucketed.as[(String, Long)].collect().sortBy(_._1).toSeq
    val b = plain.as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
