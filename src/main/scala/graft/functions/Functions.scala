package graft.functions

import graft.extract.TitleKey
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the clustering-key functions
  * (SURVEY.md §7.3 "candidate for Expression later" — promoted here).
  *
  * Why expressions and not UDFs/typed maps: the title key feeds shuffle
  * keys inside relational stages; a ScalaUDF forces ser/de at the call
  * site and a typed map forces a whole-row encoder boundary — both were
  * measured to cost real throughput (BENCH/BASELINE.md "encoder
  * boundary"). These generate a direct static call inside whole-stage
  * codegen, so `withColumn("key", simhash64_title($"title"))` stays in
  * the generated loop.
  */
object Impl {
  // static entry points referenced from generated code
  def normTitle(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(TitleKey.normTitle(s.toString))
  def simhashOfTitle(s: UTF8String): Long =
    if (s == null) 0L
    else TitleKey.simhash64(TitleKey.tokens(TitleKey.normTitle(s.toString)))
}

/** lower + strip non-letter/digit + collapse spaces (deviation D1). */
case class NormTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    Impl.normTitle(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.normTitle($c)")
  override protected def withNewChildInternal(c: Expression): NormTitle = copy(c)
  override def prettyName: String = "norm_title"
}

/** simhash64 over the normalized title's tokens (the clustering key). */
case class SimHash64Title(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Impl.simhashOfTitle(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.simhashOfTitle($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Title = copy(c)
  override def prettyName: String = "simhash64_title"
}

object GraftFunctions {

  def norm_title(c: Column): Column =
    GraftColumnBridge.column(NormTitle(GraftColumnBridge.expression(c)))
  def simhash64_title(c: Column): Column =
    GraftColumnBridge.column(SimHash64Title(GraftColumnBridge.expression(c)))

  /** Register for SQL parity: `SELECT norm_title(title), simhash64_title(title)`.
    * detect_lang rides along as a plain UDF (SURVEY.md §2 P2).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_title", exprs => NormTitle(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_title", exprs => SimHash64Title(exprs.head), "built-in")
    spark.udf.register("detect_lang", (s: String) => graft.lang.LangId.detect(s))
  }
}
