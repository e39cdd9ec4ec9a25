package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * scheme) over character k-grams of a pre-normalized string: the
  * sorted distinct set of per-window minima of a Karp–Rabin ROLLING
  * polynomial hash.
  *
  * Why a native expression: the naive formulation is O(n·k) substring
  * hashes plus O(n·w) window minima per document, built from a
  * five-deep higher-order-function stack (CodegenFallback, boxed).
  * This eval is a single O(n) pass — the rolling hash reuses the
  * previous k-gram's value, and the sliding-window minimum runs on a
  * monotonic deque — with primitive longs throughout.
  *
  * Portability contract (the DuckDB oracle recomputes every value):
  * hashes are Σ c_j·B^(k-1-j) mod M over Unicode CODE POINTS (not
  * UTF-16 units — DuckDB's ascii() yields code points) with B = 257
  * and M = 2^31−1, so every intermediate fits in an i64 on any engine.
  * A document yields max(0, n−k+1−w+1) windows; shorter inputs yield
  * an empty fingerprint set.
  */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {

  require(k >= 1 && w >= 1, "k-gram and window sizes must be >= 1")

  // same analysis-time string contract as WordShingles: eval casts to
  // UTF8String, so a non-string SQL argument must coerce or fail at
  // analysis, not ClassCastException mid-task
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  import WinnowFingerprints.{B, M}

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points, not chars: supplementary-plane text must hash the
    // same way DuckDB's ascii() sees it
    val cps = s.codePoints().toArray
    val n = cps.length
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Any])

    // pows(i) = B^i mod M; drop term uses B^(k-1)
    val powK1 = WinnowFingerprints.pow(k - 1)
    val hs = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= k) {
        // already added k+1 chars: strip the outgoing one (it has been
        // multiplied by B exactly k times since it entered)
        h = (h - (cps(i - k) * powK1 % M) * B % M + M * 2) % M
      }
      if (i >= k - 1) hs(i - k + 1) = h
      i += 1
    }

    // sliding-window minimum via monotonic deque: indices of candidate
    // minima in increasing hash order
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nh)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < nh) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hs(deque(head)))
      i += 1
    }

    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Rolling-hash base and modulus: M = 2^31−1 (prime) keeps every
    * product below 2^63 in both engines' 64-bit integer arithmetic. */
  val B = 257L
  val M = 2147483647L

  def pow(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * B % M; i += 1 }
    r
  }
}
