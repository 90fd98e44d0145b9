package graft

import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftFacadeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("facade verbs run end-to-end and agree with each other") {
    import spark.implicits._
    val g = Graft(spark)
    val docs = Synth.corpus(spark, 42L, 600L)
    val langs = g.languages(docs).as[(String, String)].collect()
    assert(langs.nonEmpty && langs.map(_._1).toSet == Set("en", "ru"))
    val news = g.news(docs).count()
    val cats = g.categories(docs).as[(String, String)].collect()
    assert(news <= cats.length) // news ⊆ categorized
    val th = g.threads(docs).collect()
    assert(th.nonEmpty && th.forall(_.getAs[Long]("size") >= 2))
    val top = g.top(docs).collect()
    assert(top.map(_.getString(0)).contains("any"))
    // SQL functions registered by the facade
    assert(spark.sql("SELECT norm_title('A b!') AS x").head().getString(0) == "a b")
  }

  test("table-native verbs equal the typed verbs and plan object-free") {
    import spark.implicits._
    val g = Graft(spark)
    val dir = java.nio.file.Files.createTempDirectory("facade_tbl").toString
    Synth.corpus(spark, 42L, 600L).write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val typedDocs = spark.read.parquet(dir).as[graft.model.Doc]

    val viaDf = g.languagesDf(table).as[(String, String)].collect().sorted.toSeq
    val viaDs = g.languages(typedDocs).as[(String, String)].collect().sorted.toSeq
    assert(viaDf == viaDs)

    def th(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("title_norm", "size", "cast(articles AS string) AS a")
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(th(g.threadsDf(table)) == th(g.threads(typedDocs).drop("category")))

    val plan = g.threadsDf(table).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"), plan.take(1200))
  }
}
