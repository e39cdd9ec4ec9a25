package graft.operators

import graft.SparkSpec

/** Parallelism-independence: the queries whose results involve floats
  * must be BIT-identical when the shuffle partitioning changes —
  * that's the exact-fixed-point/DECIMAL design claim, and on a
  * 1000-executor cluster it is a correctness property, not a nicety
  * (partial-aggregation order is nondeterministic there). */
class DeterminismSpec extends SparkSpec {

  // float-bearing queries across the aggregate styles: DECIMAL money
  // (q1), fixed-point vector means (q37), trained-k-means ANN (q41),
  // range-partitioned rank (q25), quantization error (q51), salted
  // two-stage agg (q48), double-division stats (q47), fixed-point ADC
  // sums over scattered code rows (q61: exhaustive PQ scan; q68:
  // residual IVFPQ — also covers the shared adcShortlist tail q65
  // routes through)
  private val targets = Seq(
    "q1_pricing_summary", "q25_percentiles", "q37_label_centroids",
    "q41_knn_ivf", "q47_bpe_tokens", "q48_salted_hotkeys",
    "q51_quantize_embed", "q61_knn_pq", "q68_knn_ivfpq_res")

  test("float-bearing queries are bit-identical across shuffle parallelism") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try targets.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      conf.set("spark.sql.shuffle.partitions", "3")
      val a = q(spark, sfDir).collect().toSeq
      conf.set("spark.sql.shuffle.partitions", "13")
      val b = q(spark, sfDir).collect().toSeq
      assert(a == b, s"$name differs across parallelism")
      assert(a.nonEmpty, name)
    } finally conf.set("spark.sql.shuffle.partitions", orig)
    // finally: a mid-loop failure must not leave the SHARED session
    // pinned at 3/13 partitions for every later suite
  }
}
