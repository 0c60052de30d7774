package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * Lives under `org.apache.spark.sql` because the expression-authoring
  * surface (`AbstractDataType`, the Column↔Expression bridge) is
  * `private[sql]` in Spark 4 — the standard placement for third-party
  * expression libraries. The public API is `graft.functions.VectorFunctions`.
  *
  * The built-in formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates a lambda frame per element and runs interpreted per pair — at
  * N² pairs (brute-force similarity) it dominated the benchmark (106 s for
  * 500×500 vectors). This expression compiles to a tight primitive loop
  * inside whole-stage codegen: no boxing, no per-element dispatch, direct
  * `ArrayData.getFloat` access. Accumulation is sequential in double (index
  * order), bit-identical to the higher-order fold it replaces, so oracle
  * results are unchanged.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Column ↔ catalyst Expression bridge for expression authors (the
  * `private[sql]` half of the classic Column API). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** SQL-surface registration of the graft expressions, so `spark.sql` users
  * can call them: `SELECT float_vector_dot(a, b)`.
  *
  * Two entry points:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (session-creation time, the production path);
  *  - [[GraftFunctions.register]] on an already-running session (tests).
  */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** Static int parameters (shingle width, hash count) must be literals in
    * SQL calls — they are constructor parameters, not runtime children. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal INT argument, got $other")
  }

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("float_vector_dot", classOf[FloatVectorDot])(c => FloatVectorDot(c(0), c(1))),
      fn("word_shingles", classOf[WordShingles])(c =>
        WordShingles(c(0), intLit(c(1), "word_shingles"))),
      fn("minhash_sig", classOf[MinHashSig])(c =>
        MinHashSig(c(0), intLit(c(1), "minhash_sig"))),
      fn("simhash16", classOf[SimHash16])(c => SimHash16(c(0))),
      fn("char_entropy", classOf[CharEntropy])(c => CharEntropy(c(0))),
      fn("nfc_normalize", classOf[NfcNormalize])(c => NfcNormalize(c(0))),
      fn("simhash64", classOf[SimHash64])(c => SimHash64(c(0))),
      fn("min_gram_md5", classOf[MinGramMd5])(c => MinGramMd5(c(0))),
      fn("cooc_pairs", classOf[CoocPairs])(c =>
        CoocPairs(c(0), intLit(c(1), "cooc_pairs"))),
      fn("adj_pairs", classOf[AdjPairs])(c => AdjPairs(c(0))),
      fn("hash_embed", classOf[HashEmbed])(c =>
        HashEmbed(c(0), intLit(c(1), "hash_embed"))),
      // aggregate: the analyzer wraps a bare AggregateFunction returned by
      // a registry builder into an AggregateExpression
      fn("float_vector_sum", classOf[FloatVectorSumAgg])(c => FloatVectorSumAgg(c(0))),
      fn("float_vector_weighted_sum", classOf[FloatVectorWeightedSumAgg])(c =>
        FloatVectorWeightedSumAgg(c(0), c(1))),
      fn("kmv_sketch", classOf[KmvSketchAgg])(c =>
        KmvSketchAgg(c(0), intLit(c(1), "kmv_sketch"))),
      fn("misra_gries", classOf[MisraGriesAgg])(c =>
        MisraGriesAgg(c(0), intLit(c(1), "misra_gries"))),
      fn("count_min", classOf[CountMinAgg])(c =>
        CountMinAgg(c(0), intLit(c(1), "count_min"), intLit(c(2), "count_min"))),
      fn("min_k_long", classOf[LongMinKAgg])(c =>
        LongMinKAgg(c(0), intLit(c(1), "min_k_long"))))

  def register(spark: SparkSession): Unit = functions.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => NanosWatermarkPushdown)
  }
}
