package graft.functions

import graft.extract.TitleKey
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
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

  /** Cosine similarity over two `array<float>` values with the
    * Similarity.dotNorm kernel's exact semantics: floats widened to
    * double BEFORE multiplying, three accumulators folded left-to-right
    * in ONE primitive loop (bitwise-identical to the separate
    * cast-to-double zip_with/aggregate folds it replaces — per-
    * accumulator summation order is unchanged), zero-norm → 0.0 (never
    * NaN: NaN sorts above every sim in a rank window). Precondition:
    * equal-length arrays with non-null elements — [[CosineSim]] returns
    * NULL on a length mismatch BEFORE calling this (ADVICE r7: the
    * zip_with form it replaced null-padded the shorter array and
    * returned NULL, so a malformed row must stay loud, not score a
    * plausible min-length-prefix similarity). A single JIT-compiled
    * static call — no per-row array casts, no zip_with intermediates,
    * no interpreted lambdas.
    */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}

/** lower + strip non-letter/digit + collapse spaces (deviation D1). */
case class NormTitle(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    Impl.normTitle(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.normTitle($c)")
  override protected def withNewChildInternal(c: Expression): NormTitle = copy(c)
  override def prettyName: String = "norm_title"
}

/** simhash64 over the normalized title's tokens (the clustering key). */
case class SimHash64Title(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Impl.simhashOfTitle(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.simhashOfTitle($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Title = copy(c)
  override def prettyName: String = "simhash64_title"
}

/** Native cosine similarity over two `array<float>` columns — the ANN
  * candidate-scoring kernel (ivfSearch / lshBucketTopK /
  * lshMultiProbeTopK / cosineDupPairs verify). The zip_with+aggregate
  * Column form it replaces allocated two cast arrays + three zip_with
  * intermediates and evaluated interpreted lambdas per element — the
  * dominant per-candidate cost at every tier (see BENCH/BASELINE.md r7).
  *
  * Length mismatch → NULL (ADVICE r7): the zip_with form null-padded the
  * shorter array, so `p * q` went NULL and the whole score was NULL —
  * a malformed row must stay VISIBLY malformed, not quietly score its
  * min-length prefix. Fixed-dim embedding tables never hit this; the
  * null branch costs one length compare per row.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with ExpectsInputTypes {
  // STRICT array<float> (no implicit cast): the kernel reads 4-byte
  // element strides via ArrayData.getFloat — over an UnsafeArrayData
  // written with 8-byte doubles that would silently return garbage
  // similarities, so any other element type must fail ANALYSIS, and an
  // implicit double→float cast would quietly change the scored values
  override def inputTypes: Seq[GraftColumnBridge.AbstractType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null inputs OR length mismatch
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else Impl.cosineSim(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Impl.cosineSim($a, $b);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object GraftFunctions {

  def norm_title(c: Column): Column =
    GraftColumnBridge.column(NormTitle(GraftColumnBridge.expression(c)))
  def simhash64_title(c: Column): Column =
    GraftColumnBridge.column(SimHash64Title(GraftColumnBridge.expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register for SQL parity: `SELECT norm_title(title), simhash64_title(title)`.
    * detect_lang rides along as a plain UDF (SURVEY.md §2 P2).
    */
  // SQL-side arity check: a wrong-arity call must read as a usage error,
  // not an IndexOutOfBoundsException from exprs(1)
  private def arity(name: String, n: Int, exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_title", exprs => NormTitle(arity("norm_title", 1, exprs).head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_title", exprs => SimHash64Title(arity("simhash64_title", 1, exprs).head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", { exprs0 =>
        val exprs = arity("cosine_sim", 2, exprs0)
        CosineSim(exprs.head, exprs(1))
      }, "built-in")
    spark.udf.register("detect_lang", (s: String) => graft.lang.LangId.detect(s))
  }
}
