package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductF64, NgramTopCount, TopKAgg, WinnowFingerprints, WordShingles}

/** SparkSessionExtensions hook: registers the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd hot paths as the DataFrame API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT dot_f64(a, b) FROM vectors")
  * spark.sql("SELECT word_shingles(text, 3) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (id, info, b) =>
      ext.injectFunction((id, info, b))
    }
    // HOF dot-product pattern → native codegen'd expression. For an
    // already-running session use
    // spark.experimental.extraOptimizations :+= DotProductRule instead.
    ext.injectOptimizerRule(_ => graft.functions.DotProductRule)
  }
}

object GraftExtensions {

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(
    (FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_f64(a, b) takes two array<double>")
        DotProductF64(args.head, args(1))
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n) takes two args")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"word_shingles width must be a literal, got $other")
        }
        WordShingles(args.head, n)
      }),
    (FunctionIdentifier("ngram_top_count"),
      new ExpressionInfo(classOf[NgramTopCount].getName, "ngram_top_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_top_count(text, n) takes two args")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"ngram_top_count width must be a literal, got $other")
        }
        NgramTopCount(args.head, n)
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnow_fingerprints(text, k, w) takes three args")
        val Seq(k, w) = args.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"winnow_fingerprints sizes must be literals, got $other")
        }
        WinnowFingerprints(args.head, k, w)
      }),
    (FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_agg(score, id, k) takes three args")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"topk_agg k must be a literal, got $other")
        }
        TopKAgg(args.head, args(1), k)
          .toAggregateExpression(isDistinct = false)
      }))

  /** Install into an already-running session (config-based extensions
    * only apply at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, b) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, id, info, b)
    }
}
