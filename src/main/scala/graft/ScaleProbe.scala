package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale-probe main (not part of the driver contract): times a
  * targeted subset of the heavy operators ONCE against a replicated
  * dataset (default /tmp/sfbig: documents ×40 with per-replica token
  * namespaces, embeddings ×4, facts ×20 over sf0.1) to surface
  * nonlinear blowups the tiny fixtures can't — the "would this hold at
  * 100×?" question, measured instead of argued. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.driver.memory", "24g")
      // typed-buffer aggregates (SimHashAgg) group per document; the
      // default 128-key threshold would sort-fall-back every task
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 22)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet
    def t(name: String): Unit =
      if (only.isEmpty || only(name)) {
        val t0 = System.nanoTime()
        try {
          val n = SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
        } catch {
          case e: Throwable =>
            println(s"[scale] $name FAILED after " +
              f"${(System.nanoTime() - t0) / 1e9}%.1f s: " +
              e.toString.takeWhile(_ != '\n').take(160))
        }
      }
    Seq(
      "q1_pricing_summary", "q25_percentiles", "q48_salted_hotkeys",
      "q38_asof_join", "q39_sessions", "q49_range_join",
      "q20_token_stats", "q30_exact_dedup", "q31_minhash_dedup",
      "q32_simhash_dedup", "q33_source_jaccard", "q46_winnow_pairs",
      "q53_contamination", "q50_dedup_clusters", "q44_corpus_clean",
      "q54_corpus_v2", "q34_cosine_pairs", "q36_knn_lsh", "q41_knn_ivf",
      "q45_embed_dedup", "q51_quantize_embed").foreach(t)
    spark.stop()
  }
}
