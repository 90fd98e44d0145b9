package graft

import graft.extract.TitleKey
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native expressions equal the Scala functions, incl. nulls") {
    import spark.implicits._
    val titles = Seq("Hello,  WORLD! 2024", "Путин — в Москве", "", null)
    val df = titles.toDF("t")
      .select(col("t"),
        GraftFunctions.norm_title(col("t")).as("nt"),
        GraftFunctions.simhash64_title(col("t")).as("sh"))
    val rows = df.collect()
    titles.zip(rows).foreach { case (t, r) =>
      if (t == null) { assert(r.isNullAt(1)); assert(r.isNullAt(2)) }
      else {
        assert(r.getString(1) == TitleKey.normTitle(t))
        assert(r.getLong(2) == TitleKey.simhash64(TitleKey.tokens(TitleKey.normTitle(t))))
      }
    }
  }

  test("registered for SQL: norm_title / simhash64_title / detect_lang") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT norm_title('A,B c!') AS nt,
        |simhash64_title('hello world') AS sh,
        |detect_lang('the government said it was ready for the election') AS lg""".stripMargin)
      .head()
    assert(r.getString(0) == "a b c")
    assert(r.getLong(1) == TitleKey.simhash64(Array("hello", "world")))
    assert(r.getString(2) == "en")
  }

  test("cosine_sim rejects non-float arrays and wrong arity at ANALYSIS, not with garbage values") {
    GraftFunctions.register(spark)
    // array<float>: works in SQL and matches the kernel
    val ok = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS s").head().getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
    // array<double>: the kernel reads 4-byte strides — without the input
    // type check an UnsafeArrayData written with 8-byte doubles returns
    // silent garbage; it must fail analysis instead
    val eDouble = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d))").head()
    }
    assert(eDouble.getMessage.toLowerCase.contains("cosine_sim") ||
      eDouble.getMessage.contains("DATATYPE_MISMATCH"), eDouble.getMessage)
    // array<int> likewise
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(1, 2))").head()
    }
    // wrong arity: a usage error, not IndexOutOfBoundsException
    val eArity = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(cast(1.0 as float)))").head()
    }
    assert(!eArity.isInstanceOf[IndexOutOfBoundsException])
    assert(Option(eArity.getMessage).exists(_.contains("cosine_sim")), eArity.toString)
    // the strict check accepts nullable-element float arrays (sameType
    // ignores containsNull) — the embedding tables are exactly that shape
    import spark.implicits._
    val emb = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    assert(emb.select(GraftFunctions.cosine_sim(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("expression stays inside whole-stage codegen (no ScalaUDF)") {
    // parquet-backed (a local Seq would be constant-folded to LocalTableScan)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.simhash64_title(col("text")).as("k"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // "*(1)" marks the WholeStageCodegen span in the simple plan string
    assert(plan.contains("*(1) Project [simhash64_title"), plan)
    assert(df.count() == 500) // and it executes
  }
}
