package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest multiplicity among the word n-grams of a pre-normalized
  * (single-spaced) string — `max(count per distinct n-gram)`, 0 when
  * the text has fewer than n tokens.
  *
  * This is the per-ROW form of the Gopher/MassiveText "top n-gram
  * share" numerator (q64): the statistic is a pure function of one
  * document, so computing it by `explode → groupBy(doc, gram) →
  * groupBy(doc)` ships every n-gram STRING of the corpus through two
  * shuffles just to throw them away. One expression node per row
  * computes the same exact integer with ZERO shuffle — at 100 TB the
  * difference between a corpus-wide string exchange and an
  * embarrassingly parallel scan. Same single-tight-loop trade as
  * [[WordShingles]] (one CodegenFallback node, not a HOF stack); the
  * hash map lives for one row and is bounded by the document's
  * distinct n-grams.
  *
  * Tokenization matches [[TextFunctions.tokens]] over the normal form:
  * split on whitespace runs, empties dropped (so blank text has zero
  * tokens, not one phantom). Feed it `normText(text)`; NULL
  * propagates.
  */
final case class NgramTopCount(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {

  require(n >= 1, "n-gram width must be >= 1")

  // same analysis-time contract as WordShingles: eval casts straight to
  // UTF8String, so a non-string SQL argument must be coerced/rejected
  // by the analyzer, never a mid-task ClassCastException
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_top_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return 0L
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var max = 0
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    max.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
