package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q78 per-stage overlap decomposition (VERDICT r14 #3): attribute the
  * composed pipeline's overlap-vs-exact-twin to its approximate stages
  * by swapping ONE stage for its exact counterpart at a time:
  *
  *  - `serve_exact`  — pipeline corpus + index-dedup drops, but the
  *    final top-k computed brute-force among the survivors (isolates
  *    the IVF×PQ serving leg's loss);
  *  - `dedup_exact`  — exact pairwise dedup over the pipeline corpus,
  *    served through IVF×PQ (isolates the index-dedup stage's loss);
  *  - `screen_delta` — symmetric difference between the pipeline's
  *    composed corpus (index-screened admissions) and the exact twin's
  *    composed set (how much stage 2/3 diverges, in ids — the screen's
  *    error is one-sided, so this is the input drift the later stages
  *    inherit).
  *
  * One JSON line per scale dir. Probe main, not a gated query — the
  * floor derivation it feeds lives in the round artifact.
  *
  *   sbt "runMain graft.StageOverlap /root/testdata/sf0.01"
  */
object StageOverlap {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageOverlap <sfDir>...")
    val spark = graft.GraftSession.local("graft-stageoverlap")
    // EmbedPipeline, IndexStore, Similarity are package siblings
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    args.foreach { sfDir =>
      val got = pairs(EmbedPipeline.q78EmbedPipeline(spark, sfDir))
      val twin = pairs(EmbedPipeline.q78ExactTwin(spark, sfDir))
      def overlap(s: Set[(Long, Long)]): Double =
        if (twin.isEmpty) { if (s.isEmpty) 1.0 else 0.0 }
        else (twin intersect s).size.toDouble / twin.size
      val corpusDir = s"${EmbedPipeline.pipeDirFor(spark, sfDir)}/c"
      val info = IndexStore.ensure(spark, corpusDir)
      val corpusIds = graft.sources.Tables
        .load(spark, corpusDir, "embeddings").select(col("vec_id"))
      // the pipeline's own dedup exclusion (stage 4, index-backed)
      val droppedIdx = corpusIds.join(
        IndexStore.queryEmbedDedup(spark, corpusDir, info)
          .select(col("vec_id")), Seq("vec_id"), "left_anti")
      // exact brute-force top-k among survivors — EmbedPipeline's own
      // serving-leg helper (one definition with the twin's stage 5)
      def bruteServe(dropped: DataFrame): DataFrame = {
        val pe = Similarity.prepped(spark, corpusDir)
          .filter(Similarity.validNorm)
        val se = pe.join(dropped, Seq("vec_id"), "left_anti")
        val q = pe.filter(col("vec_id") < Similarity.knnQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"))
        EmbedPipeline.bruteTopK(q, se)
      }
      val serveExact = overlap(pairs(bruteServe(droppedIdx)))
      // exact dedup over the pipeline corpus, IVF×PQ serve
      val droppedExact = Similarity.exactPairs(
          Similarity.prepped(spark, corpusDir).filter(Similarity.validNorm))
        .select(col("vec_b").as("vec_id")).distinct()
      val dedupExact = overlap(pairs(
        IndexStore.queryIvfPq(spark, corpusDir, info,
          exclude = Some(droppedExact))))
      // stage 2/3 drift: pipeline corpus vs the twin's exact composed
      // set — EmbedPipeline's own definition (previously an inline
      // copy that re-ran the O(|batch|·N) exact screen a second time
      // per dir and could drift from the twin)
      val pipeIds = corpusIds.collect().map(_.getLong(0)).toSet
      val exactComposed = EmbedPipeline.exactComposedIds(spark, sfDir)
        .collect().map(_.getLong(0)).toSet
      val screenDelta = (pipeIds diff exactComposed).size +
        (exactComposed diff pipeIds).size
      println(s"""{"probe":"q78stages","sf":${graft.Json.str(sfDir)},""" +
        s""""composed":${f4(overlap(got))},""" +
        s""""serve_exact":${f4(serveExact)},""" +
        s""""dedup_exact":${f4(dedupExact)},""" +
        s""""screen_delta_ids":$screenDelta,""" +
        s""""corpus_n":${pipeIds.size},"twin_pairs":${twin.size}}""")
    }
    spark.stop()
  }
}
