package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WinnowFingerprints: the O(n) rolling-hash/deque eval must agree with
  * a direct O(n·k·w) reference on arbitrary input, and uphold the
  * winnowing guarantee (shared spans ⇒ shared fingerprint). */
class WinnowSpec extends SparkSpec {

  private val k = 8
  private val w = 4

  /** Direct reference: polynomial hash per k-gram, min per window. */
  private def naive(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val nh = n - k + 1
    if (nh < w) return Seq.empty
    import WinnowFingerprints.{B, M}
    val hs = (0 until nh).map { i =>
      (0 until k).foldLeft(0L)((h, j) =>
        (h + cps(i + j) * WinnowFingerprints.pow(k - 1 - j)) % M)
    }
    (0 to nh - w).map(i => hs.slice(i, i + w).min).distinct.sorted
  }

  private def viaSpark(texts: Seq[String]): Seq[Seq[Long]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
      .orderBy(col("i"))
      .select(TextFunctions.winnow(col("text"), k, w).as("fps"))
      .collect()
      .map(_.getSeq[Long](0).toSeq)
      .toSeq
  }

  test("matches the direct polynomial reference on fuzzed strings") {
    val rng = new scala.util.Random(4242)
    val alphabet = "abcdefghij  09中é" // incl. spaces + non-ASCII
    val samples = Seq.fill(120)(
      Seq.fill(rng.nextInt(60))(alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    val got = viaSpark(samples)
    // the expression normalizes internally; the reference gets the
    // same normal form
    samples.zip(got).foreach { case (raw, fps) =>
      val norm = raw.trim.toLowerCase.replaceAll("\\s+", " ")
      assert(fps == naive(norm), s"input '$raw'")
    }
  }

  test("short inputs yield empty fingerprint sets") {
    // < k chars: no k-gram; < k+w-1 chars: k-grams but no full window
    assert(viaSpark(Seq("", "abc", "a" * (k + w - 2))).forall(_.isEmpty))
    assert(viaSpark(Seq("ab" * (k + w))).head.nonEmpty)
  }

  test("winnowing guarantee: docs sharing a long span share a fingerprint") {
    // any common substring of length >= k+w-1 must contribute at least
    // one common SELECTED fingerprint (Schleimer et al., theorem 1)
    val span = "the quick brown fox jumps over the lazy dog"
    val a = s"unrelated prefix text here $span and a suffix"
    val b = s"$span entirely different continuation afterwards"
    val Seq(fa, fb) = viaSpark(Seq(a, b))
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }
}
