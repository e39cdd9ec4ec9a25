package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q78: the embeddings END-TO-END pipeline, composed — the vector-side
  * twin of q54's document corpus-assembly composition. Every stage is
  * one of this engine's shipped operators, chained through their REAL
  * interfaces (the persisted index dir, the veclists sidecar, the
  * append contracts), so any drift between them — a schema change, a
  * marker-format bump, a validation regression — breaks THIS gated
  * query instead of waiting for a deployment to find it:
  *
  *  1. SEED: the corpus split (`!batchPred` of the embeddings table)
  *     becomes a standing corpus in engine-managed scratch, with its
  *     persisted IVF×PQ index ([[IndexStore.ensure]]) and SemDeDup
  *     inverted lists ([[IngestScreen.ensureLists]]);
  *  2. INGEST: the `batchPred` slice arrives as a batch — anti-joined
  *     against the corpus (the streaming sinks' replay discipline: a
  *     re-run of this whole query admits nothing and changes nothing),
  *     within-batch exact-deduped ([[IngestScreen.withinBatchDrops]]),
  *     then screened against the standing corpus through the index
  *     ([[IngestScreen.screenBatch]] — SemDeDup at ingest);
  *  3. ADMIT: survivors enter the index ([[IndexStore.appendBatch]]),
  *     the lists ([[IngestScreen.appendLists]]), and the corpus table —
  *     in that order, the crash discipline the streaming sink pins —
  *     and [[IndexStore.ensure]] must then REVALIDATE the grown corpus
  *     without a rebuild (the incremental-maintenance contract);
  *  4. DEDUP: index-backed embedding dedup over the grown corpus
  *     ([[IndexStore.queryEmbedDedup]] — q71's operator) marks the
  *     non-survivors;
  *  5. SERVE: IVF×PQ top-k ([[IndexStore.queryIvfPq]] — q69's
  *     operator) for the standard query batch, with the dedup
  *     non-survivors EXCLUDED from the candidate stream (soft-delete
  *     serving: rank-k is computed among survivors, not filtered
  *     after the fact).
  *
  * Output: (query_id, neighbor_id, rank) — cosine is dropped because
  * the gate compares SETS against the exact twin and approximate
  * pipelines agree on membership long before they agree on float
  * text. Gated by Verify's composed-overlap floor against
  * [[q78ExactTwin]] (every approximate stage replaced by its exact
  * counterpart); `no_oracle` for DuckDB, same class as the ANN family.
  *
  * Scale: the composition adds NOTHING beyond its stages' own costs —
  * each is individually scale-audited (q76/q71/q69); the corpus write
  * is one append of the admitted batch. The scratch corpus is
  * rebuilt only when absent, so a session-holding caller pays seed
  * cost once. */
object EmbedPipeline {

  /** Engine-managed scratch home of the composed pipeline's corpus for
    * one source dir (same seam as [[IndexStore.dirFor]]). */
  def pipeDirFor(spark: SparkSession, sfDir: String): String =
    graft.Scratch.stableDir(spark, "embpipe", sfDir)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    fs.exists(p)
  }

  def q78EmbedPipeline(spark: SparkSession, sfDir: String): DataFrame =
    IndexStore.synchronized {
      val root = pipeDirFor(spark, sfDir)
      val corpusDir = s"$root/c"
      val table = s"$corpusDir/embeddings.parquet"
      val all = Tables.load(spark, sfDir, "embeddings")
      // SEED IDENTITY: the scratch corpus derives from the SOURCE
      // table, which ensure() cannot see (it validates index-vs-
      // scratch, not scratch-vs-source) — a source rewrite would
      // otherwise leave a plausible stale pipeline serving the old
      // corpus forever. One source-count+fingerprint agg per call
      // (gate-scale cheap, linear scan at scale — same class as
      // ensure's own corpus identity scan); any mismatch reseeds from
      // scratch.
      // same "count|fp" term as DeletePipeline.sourceId, now behind
      // the table's file signature (r18, cachedSourceId's doc): the
      // per-call O(corpus) fingerprint scan reruns only when the
      // source files actually change
      val seedId = s"graftembpipe|1|" + DeletePipeline.cachedSourceId(
        spark, sfDir, "embeddings", "xxhash64(vec_id, embedding)")
      val (fs, seedP) = graft.Scratch.fs(spark, s"$root/_seed")
      val seedCurrent = fs.exists(seedP) &&
        (try new String(graft.Scratch.readSmallFile(fs, seedP),
          "UTF-8") == seedId
        catch { case scala.util.control.NonFatal(_) => false })
      if (!seedCurrent) {
        val (rfs, rp) = graft.Scratch.fs(spark, root)
        if (rfs.exists(rp)) rfs.delete(rp, true)
      }
      // 1. SEED (idempotent: only when absent — the repeat-run path
      // validates the standing corpus instead of rewriting it)
      if (!exists(spark, table)) {
        all.filter(!IngestScreen.batchPred)
          .write.mode(SaveMode.ErrorIfExists).parquet(table)
        // marker AFTER the data: a crash between them reseeds (the
        // safe direction), never vouches for a half-written seed
        val out = fs.create(seedP, true)
        try out.write(seedId.getBytes("UTF-8")) finally out.close()
      }
      var info = IndexStore.ensure(spark, corpusDir)
      IngestScreen.ensureLists(spark, corpusDir, info)
      // 2-3. INGEST + ADMIT, gated by a STAGE MARKER (`_ingested`,
      // the q81 sentinel discipline): a completed run's replay must
      // be a literal serve-only no-op. The corpus anti-join alone
      // cannot promise that — a row the EXACT within-batch keeper
      // dropped in run 1 is still corpus-absent on replay, its
      // admitted partner no longer rides the batch side, and the
      // APPROXIMATE corpus screen (bounded nprobe) may miss the
      // partner's cell and admit it — mutating the standing corpus
      // between reps (observable wherever nlistFor(n) > the probe
      // cap). The marker is stamped AFTER the admit stage completes
      // (crash → no marker → the replay re-runs ingest, whose crash
      // windows are the sink's own: partially-admitted rows anti-join
      // out, and the residual re-screen of run-1-dropped rows is
      // confined to that bounded recovery, converging to a corpus the
      // screens accept — never a silent wrong SERVE).
      val (mfs, ingMarker) = graft.Scratch.fs(spark, s"$root/_ingested")
      if (!mfs.exists(ingMarker)) {
        val corpusIds = spark.read.parquet(
          graft.sources.Generations.resolve(spark, table)).select("vec_id")
        val fresh = graft.Materialize(
          all.filter(IngestScreen.batchPred)
            .join(corpusIds, Seq("vec_id"), "left_anti"))
        if (!fresh.isEmpty) {
          val b2 = graft.Materialize(fresh.join(
            IngestScreen.withinBatchDrops(fresh), Seq("vec_id"),
            "left_anti"))
          // batch shape by COUNT (the streaming sink's rule): this
          // framing batch is a fixed slice of the table, so at a big
          // dir the broadcast-probes form would force |batch|·np wide
          // vector rows through the driver
          val admitted = graft.Materialize(
            b2.join(IngestScreen.screenBatch(spark, corpusDir, info, b2,
                smallBatch = b2.count() <= IngestScreen.smallBatchMax),
              Seq("vec_id"), "left_anti"))
          if (!admitted.isEmpty) {
            val stats = IndexStore.appendBatch(spark, info.dir,
              admitted.select(col("vec_id"), col("embedding")))
            IngestScreen.appendLists(spark, corpusDir,
              admitted.select(col("vec_id"), col("embedding")))
            admitted.write.mode(SaveMode.Append)
              .parquet(graft.sources.Generations.resolve(spark, table))
            val re = IndexStore.ensure(spark, corpusDir)
            // drift detector, scoped to where the contract PROMISES a
            // validate-without-rebuild: growing n across an nlistFor
            // boundary makes a retrain the LEGITIMATE ensure answer
            // (the cell count must track √N — the maintenance policy,
            // not interface drift), so only a same-nl rebuild is a
            // broken appendBatch↔ensure contract
            // repaired rows grow meta.n too (a torn-repair replay
            // after a crash between the two codes writes) — omit them
            // and a legitimate boundary-crossing rebuild would be
            // condemned
            require(!re.builtNow ||
                Similarity.nlistFor(
                  info.n + stats.appended + stats.repaired) != info.nl,
              "pipeline invariant broken: ensure() REBUILT after a " +
                "same-nl append — the incremental-maintenance " +
                "contract between appendBatch and ensure has drifted")
            info = re
          }
        }
        val out = mfs.create(ingMarker, true)
        try out.write(seedId.getBytes("UTF-8")) finally out.close()
      }
      // 4. DEDUP: the q71 operator over the grown corpus; non-survivors
      // become the serving exclusion set
      val dropped = Tables.load(spark, corpusDir, "embeddings")
        .select(col("vec_id"))
        .join(IndexStore.queryEmbedDedup(spark, corpusDir, info)
          .select(col("vec_id")), Seq("vec_id"), "left_anti")
      // 5. SERVE among survivors
      IndexStore.queryIvfPq(spark, corpusDir, info,
          exclude = Some(dropped))
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }

  /** Exact composed-corpus ids — stages 1-3 with every approximation
    * replaced (exact within-batch dedup, exact batch-vs-corpus
    * screen), straight from the source table. ONE definition shared
    * by [[q78ExactTwin]] and the StageOverlap probe, which previously
    * carried a byte-identical inline copy that could drift (and
    * re-ran the O(|batch|·N) screen twice per probe dir).
    * Invalid-norm batch rows are admitted unscreened — the q45/q76
    * rule both paths share. */
  private[graft] def exactComposedIds(spark: SparkSession,
      sfDir: String): DataFrame = {
    val all = Tables.load(spark, sfDir, "embeddings")
    val pe = Similarity.prepped(spark, sfDir).filter(Similarity.validNorm)
    val withinDrops = Similarity
      .exactPairs(pe.filter(IngestScreen.batchPred))
      .select(col("vec_b").as("vec_id")).distinct()
    val admitted = all.filter(IngestScreen.batchPred)
      .select(col("vec_id"))
      .join(withinDrops, Seq("vec_id"), "left_anti")
      .join(IngestScreen.exactRejects(spark, sfDir),
        Seq("vec_id"), "left_anti")
    all.filter(!IngestScreen.batchPred)
      .select(col("vec_id")).union(admitted)
  }

  /** Brute-force top-k over a prepped (vec_id, v, nrm) frame: queries
    * from `queries` (aliased (query_id, qv, qnrm)), neighbors from
    * `neighbors` — the exact serving leg [[q78ExactTwin]] and the
    * StageOverlap probe share. Emits (query_id, neighbor_id, rank). */
  private[graft] def bruteTopK(queries: DataFrame,
      neighbors: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    broadcast(queries)
      .join(neighbors, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotD(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
          .as("cosine"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg
        .topkAgg(col("cosine"), col("neighbor_id"), Similarity.k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The EXACT composition the gate floors q78 against — every
    * approximate stage replaced by its exact counterpart, computed
    * straight from the source table (no scratch state, so a corrupted
    * pipeline corpus can never vouch for itself):
    * exact within-batch dedup → exact batch-vs-corpus screen → exact
    * pairwise dedup over the composed corpus → brute-force top-k among
    * survivors. O(N²) — gate-scale ground truth, not a serving path. */
  private[graft] def q78ExactTwin(spark: SparkSession,
      sfDir: String): DataFrame = {
    val pe = Similarity.prepped(spark, sfDir).filter(Similarity.validNorm)
    val composed = exactComposedIds(spark, sfDir)
    // stage 4, exact: q45's keeper rule over the composed corpus
    val dedupDrops = Similarity
      .exactPairs(pe.join(composed, Seq("vec_id"), "left_semi"))
      .select(col("vec_b").as("vec_id")).distinct()
    val survivors = composed.join(dedupDrops, Seq("vec_id"), "left_anti")
    // stage 5, exact: brute top-k — queries are the standard batch
    // (composed-corpus members; dropped queries still query, matching
    // the serving path), neighbors only among survivors
    val se = pe.join(survivors, Seq("vec_id"), "left_semi")
    val q = pe.join(composed, Seq("vec_id"), "left_semi")
      .filter(col("vec_id") < Similarity.knnQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    bruteTopK(q, se)
  }
}
