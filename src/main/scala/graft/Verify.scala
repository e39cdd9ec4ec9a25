package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The ANN variants (q36/q41/q61/q65/q68) have no SQL oracle — DuckDB
  * cannot reproduce an approximate index — so the driver's compare is
  * rows-only for them, and a recall regression would otherwise be
  * invisible to the gate. [[annRecallGate]] closes that hole: recall@k
  * of each dumped ANN result is measured here against the in-engine
  * EXACT top-k (q35's brute-force path, itself oracle-checked), and a
  * dump below its floor is DELETED so the driver records a hard FAIL
  * (missing dump), never a silent rows-only pass. Measured values land
  * in `outDir/ann_recall.json` for the round artifact.
  */
object Verify {

  /** Recall@k floors for the ANN variants, from SimilaritySpec's
    * measured characteristics (LSH 16×4 multiprobe ≥0.9; IVF nprobe
    * 5/16 ≥0.7; PQ shortlist ≥0.7; IVF×PQ compounds both ≥0.55).
    * q68 (residual IVF×PQ) is gated separately: its floor is q65's
    * MEASURED recall (lower-bounded by q65's static floor) — the
    * residual encoding strictly refines plain IVF×PQ's quantization,
    * so falling below it means the residual path is broken even if
    * some static floor still passes. */
  val annFloors: Map[String, Double] = Map(
    "q36_knn_lsh"   -> 0.9,
    "q41_knn_ivf"   -> 0.7,
    "q61_knn_pq"    -> 0.7,
    "q65_knn_ivfpq" -> 0.55,
    // persisted-index twins: bit-identical to q65/q68 by construction
    // (IndexStoreSpec pins the equality), so they inherit the IVF×PQ
    // static floor — a below-floor reading here means the PERSISTED
    // artifacts (not the algorithm) are broken, e.g. a stale or torn
    // index dir serving wrong centroids
    "q69_knn_ivfpq_idx"     -> 0.55,
    "q70_knn_ivfpq_res_idx" -> 0.55,
    // sharded serve (q84): K per-shard IVF×PQ probes, exact merge —
    // each shard trains its own quantizer on 1/K of the corpus, so
    // the serving error stays the one IVF×PQ stage's; it inherits the
    // same static floor (measured at the gate scales it tracks q69's
    // characteristic — see SURVEY 8k)
    "q84_knn_sharded"       -> 0.55)
  val annResidual = "q68_knn_ivfpq_res"

  /** q71 (index-backed embedding dedup) is gated on DROPPED-ID recall
    * against the exact q45 answer, not top-k pair recall: the operator
    * promises "every vector q45 would drop is (almost always) dropped
    * here too, and NOTHING q45 keeps is ever dropped". The second half
    * is exact by construction (candidate pairs are exact-verified), so
    * any false drop in the dump is recorded as recall −1 — a loud
    * impossible value, never a soft miss. Floor from the measured
    * characteristic at the three fixture corpora (0.93/0.97/0.97 at
    * serving dials; the probe stage's bidirectional catch is the
    * binding term). */
  val dedupIdx = "q71_embed_dedup_idx"
  val dedupExact = "q45_embed_dedup"
  val dedupFloor = 0.85

  /** q75 (both-legs-index-served hybrid RRF) is gated on fused top-k
    * OVERLAP against the exact q73 answer: |q75 ∩ q73| / |q73| over
    * all (query_id, id) result pairs. The lexical leg is bit-identical
    * by construction (q74's twin identity transfers); the vector leg
    * is the IVF×PQ probe, so divergence is bounded by how far
    * approximate vector ranks move fused scores. Measured
    * characteristic: 0.85 / 0.76 / 0.86 / 0.98 at sf0.001 / sf0.01 /
    * sf0.1 / the 8k-vector 4× corpus. Floor raised 0.65 → 0.72
    * (VERDICT r13 #4): 0.04 under the measured minimum — at 0.65 one
    * leg could silently lose a third of the fused set before the gate
    * tripped; at 0.72 the slack is one jitter band, same margin class
    * as the ANN floors. */
  val hybridIdx = "q75_hybrid_rrf_idx"
  val hybridExact = "q73_hybrid_rrf"
  val hybridFloor = 0.72

  /** q76 (index-backed ingest screen) is gated on REJECTED-ID recall
    * against the exact batch-vs-corpus screen: of the batch vectors
    * the exact screen rejects (a corpus partner at cosine ≥
    * threshold), the floored fraction must be rejected by the index
    * path too. The converse is exact by construction (every index
    * reject is exact-cosine verified in-join), so a batch row rejected
    * by q76 but kept by the exact screen is recorded as recall −1 —
    * dump/index corruption, never a soft miss. Floor from the measured
    * one-directional characteristic at np=24 across the fixture
    * corpora (see IngestScreenSpec). */
  val screenIdx = "q76_ingest_screen"
  val screenFloor = 0.80

  /** q78 (composed embeddings pipeline) is gated on top-k OVERLAP
    * against the ALL-EXACT composition ([[operators.EmbedPipeline
    * .q78ExactTwin]]): |q78 ∩ twin| / |twin| over (query_id,
    * neighbor_id) pairs. Three approximate stages compound (index
    * screen admits ⊇ exact admits; index dedup survivors ⊇ exact
    * survivors; IVF×PQ serving recall ≥ its 0.55 floor), so the
    * binding term is the serving leg and the compounded overlap can
    * sit BELOW any single stage's recall. Measured characteristic:
    * 0.62 / 0.60 / 0.72 / 0.86 at sf0.001 / sf0.01 / sf0.1 / the
    * 8k-vector 4× corpus — lowest at the small fixtures where the
    * IVF×PQ dials are at their legacy minimum and one displaced
    * neighbor is 1/50th of the set. Floor 0.55 = the serving leg's
    * own static floor: the composition must never lose MORE than its
    * one approximate serving stage is allowed to, because the other
    * two stages' errors are one-sided (admit ⊇ exact-admit,
    * survivors ⊇ exact-survivors). */
  val pipelineIdx = "q78_embed_pipeline"
  val pipelineFloor = 0.55

  /** q80 (deletion lifecycle, ANN leg) is gated two ways: recall@k of
    * the post-delete IVF×PQ serve vs the exact brute-force top-k over
    * the SURVIVOR corpus (floor 0.65, measured-minus-margin — see
    * [[deleteFloor]]), and a ZERO-TOLERANCE leak check — a killed id appearing as
    * a query or neighbor is recorded as recall −1 (hard fail): serving
    * a deleted row is the one unacceptable state of the lifecycle,
    * not a recall trade. */
  val deleteIdx = "q80_delete_ann"
  // Floor raised 0.55 → 0.65 (VERDICT r15 #3, the q75 precedent):
  // measured 0.72–0.86 across the four gate scales
  // (ANN_RECALL_r15_*.json) — at 0.55 a silent 0.15+ recall
  // regression passed; 0.65 leaves one jitter band under the
  // measured minimum.
  val deleteFloor = 0.65

  /** q82 (correction lifecycle, ANN leg): recall@k of the
    * post-correction IVF×PQ serve vs the exact top-k over the FINAL
    * (corrected) corpus — the exact twin already embodies the new
    * geometry, so ordinary recall proves the re-keyed codes serve it.
    * A second entry records the CORRECTED-REGION recall (exact pairs
    * whose query or neighbor is a corrected id): the re-keyed rows
    * are ~1/16 of the corpus, and overall recall alone could hide a
    * region that serves nothing. Region floor is lower — the region
    * sample is small and PQ error concentrates where geometry just
    * changed. */
  val correctionIdx = "q82_correction_ann"
  // Floors raised (VERDICT r15 #3): recall 0.55 → 0.65 vs measured
  // 0.72–0.84, region 0.40 → 0.55 vs measured 0.60–1.00
  // (CORRECTION_RECALL_r15.json, 4 scales) — measured-minus-margin,
  // the q75/q80 discipline.
  val correctionFloor = 0.65
  val correctionRegionFloor = 0.55

  final case class AnnGate(recall: Double, floor: Double) {
    def pass: Boolean = recall >= floor
  }

  /** THE set of recall/overlap-gated query names — the one list the
    * stale-artifact pre-delete, the machinery-failure dump deletion
    * and the below-floor enforcement all consult. It was previously
    * two copy-pasted inline predicates, and the q82 gate landed in
    * NEITHER: a targeted q82 re-run could read a stale prior-run
    * ann_recall.json as its own pass, and a gate-machinery failure
    * deleted every gated dump EXCEPT q82's. */
  private[graft] def gatedNames: Set[String] =
    annFloors.keySet + annResidual + dedupIdx + screenIdx + hybridIdx +
      pipelineIdx + deleteIdx + correctionIdx

  /** Dump directory a GATE ENTRY enforces on: the corrected-region
    * entry (`q82_correction_ann_region`) is a second verdict on the
    * q82 dump itself — deleting a literal `*_region` dir would no-op
    * (it never exists) and the region floor would never be enforced
    * on the driver's rows-only path. */
  private def dumpNameOf(gateEntry: String): String =
    if (gateEntry == s"${correctionIdx}_region") correctionIdx
    else gateEntry

  /** Delete a dump dir and FAIL LOUDLY when the delete itself fails:
    * every deletion in this gate exists to turn a bad dump into a
    * missing-dump driver FAIL, so an undeletable dump (permission
    * change, open handle on NFS) surviving unnoticed would let the
    * driver's rows-only compare record a PASS — the exact silent pass
    * the gate prevents. Same unchecked-false discipline as
    * ParquetSink.swapInto/promote. */
  private def deleteOrDie(dir: java.io.File): Unit = {
    org.apache.hadoop.fs.FileUtil.fullyDelete(dir)
    if (dir.exists())
      throw new IllegalStateException(
        s"failed to delete $dir — a stale dump left in place would " +
          "impersonate a passing result downstream")
  }

  /** Measures recall@k of each gated ANN dump under `outDir` against
    * the exact brute-force top-k. Reads the DUMPS (the exact bytes the
    * driver will compare), not a re-run — a divergence introduced by
    * the dump write itself would be caught too. Queries whose dump is
    * absent (threw during the dump loop) are skipped: they are already
    * failing. Deletion of BELOW-FLOOR dumps is the caller's move, so
    * q68's floor can read q65's recall even when q65 itself is below
    * floor; the one deletion here is q68's own dump when its dynamic
    * floor could not be resolved (unverifiable ≠ pass). */
  /** Fused-overlap of the q75 dump vs the exact q73 answer (this
    * run's q73 dump when selected, else computed live). Same isolation
    * discipline as [[dedupGate]]: a broken exact baseline costs q75
    * its dump (unverifiable ≠ pass), never the rest of the gate. */
  private def hybridGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String])
      : Option[(String, AnnGate)] = {
    if (!selected.contains(hybridIdx)) return None
    val dumpDir = new java.io.File(s"$outDir/$hybridIdx")
    if (!dumpDir.exists()) return None
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got =
      try pairs(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $hybridIdx dump unreadable, overlap skipped: " +
            e.getMessage)
        return None
      }
    val exact =
      try {
        val exactDump = new java.io.File(s"$outDir/$hybridExact")
        if (selected.contains(hybridExact) && exactDump.exists())
          pairs(spark.read.parquet(exactDump.toString))
        else pairs(operators.Retrieval.q73HybridRrf(spark, sfDir))
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] $hybridIdx overlap baseline (exact $hybridExact) " +
            s"failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable overlap is not a pass")
        deleteOrDie(dumpDir)
        return None
      }
    // vacuous guard, same rationale as recallOf: an empty exact fused
    // set (blank corpus) agrees only with an empty dump
    val overlap =
      if (exact.isEmpty) { if (got.isEmpty) 1.0 else 0.0 }
      else (exact intersect got).size.toDouble / exact.size
    Some(hybridIdx -> AnnGate(overlap, hybridFloor))
  }

  /** Composed-overlap of the q78 dump vs the all-exact twin (always
    * computed live — the twin is not a dumped query). Same isolation
    * and dump-deletion discipline as [[hybridGate]]. */
  private def pipelineGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String])
      : Option[(String, AnnGate)] = {
    if (!selected.contains(pipelineIdx)) return None
    val dumpDir = new java.io.File(s"$outDir/$pipelineIdx")
    if (!dumpDir.exists()) return None
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got =
      try pairs(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $pipelineIdx dump unreadable, overlap skipped: " +
            e.getMessage)
        return None
      }
    val exact =
      try pairs(operators.EmbedPipeline.q78ExactTwin(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $pipelineIdx overlap baseline (exact twin) " +
            s"failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable overlap is not a pass")
        deleteOrDie(dumpDir)
        return None
      }
    val overlap =
      if (exact.isEmpty) { if (got.isEmpty) 1.0 else 0.0 }
      else (exact intersect got).size.toDouble / exact.size
    Some(pipelineIdx -> AnnGate(overlap, pipelineFloor))
  }

  /** Deletion gate (q80): recall of the dump vs the exact top-k over
    * the DELETED scratch corpus, plus the zero-leak check (see
    * [[deleteIdx]]). [[operators.DeletePipeline.ensureDeleted]] is
    * idempotent — on the gate path the pipeline already ran during the
    * dump, so this re-resolves the corpus dir via the validation
    * tokens without re-deleting anything. Same isolation discipline as
    * [[pipelineGate]]. */
  private def deleteGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String])
      : Option[(String, AnnGate)] = {
    if (!selected.contains(deleteIdx)) return None
    val dumpDir = new java.io.File(s"$outDir/$deleteIdx")
    if (!dumpDir.exists()) return None
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got =
      try pairs(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $deleteIdx dump unreadable, recall skipped: " +
            e.getMessage)
        return None
      }
    val (exact, killed) =
      try {
        import org.apache.spark.sql.functions.col
        val corpusDir = operators.DeletePipeline.ensureDeleted(spark, sfDir)
        val kills = sources.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"))
          .filter(operators.DeletePipeline.kill(col("vec_id")))
          .collect().map(_.getLong(0)).toSet
        (pairs(operators.Similarity.q35KnnBrute(spark, corpusDir)), kills)
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] $deleteIdx recall baseline (exact survivor " +
            s"top-k) failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable recall is not a pass")
        deleteOrDie(dumpDir)
        return None
      }
    val leaks = got.filter { case (q, n) =>
      killed.contains(q) || killed.contains(n)
    }
    val recall =
      if (leaks.nonEmpty) {
        System.err.println(s"[verify] $deleteIdx SERVED ${leaks.size} " +
          s"pair(s) touching a DELETED id (e.g. ${leaks.take(3)
            .mkString(", ")}) — deletion leaked into serving")
        -1.0
      }
      else if (exact.isEmpty) { if (got.isEmpty) 1.0 else 0.0 }
      else (exact intersect got).size.toDouble / exact.size
    Some(deleteIdx -> AnnGate(recall, deleteFloor))
  }

  /** Correction gate (q82): recall of the dump vs the exact top-k
    * over the CORRECTED scratch corpus, plus the corrected-region
    * recall (see [[correctionIdx]]). [[operators.DeletePipeline
    * .ensureCorrected]] is idempotent — the pipeline already ran
    * during the dump. */
  private def correctionGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String])
      : Seq[(String, AnnGate)] = {
    if (!selected.contains(correctionIdx)) return Nil
    val dumpDir = new java.io.File(s"$outDir/$correctionIdx")
    if (!dumpDir.exists()) return Nil
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got =
      try pairs(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $correctionIdx dump unreadable, recall skipped: " +
            e.getMessage)
        return Nil
      }
    val (exact, corrected) =
      try {
        import org.apache.spark.sql.functions.col
        val corpusDir =
          operators.DeletePipeline.ensureCorrected(spark, sfDir)
        val corrIds = sources.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"))
          .filter(operators.DeletePipeline.kill(col("vec_id")))
          .collect().map(_.getLong(0)).toSet
        (pairs(operators.Similarity.q35KnnBrute(spark, corpusDir)),
          corrIds)
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] $correctionIdx recall baseline (exact corrected " +
            s"top-k) failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable recall is not a pass")
        deleteOrDie(dumpDir)
        return Nil
      }
    def recallOf(base: Set[(Long, Long)]): Double =
      if (base.isEmpty) { if (got.isEmpty) 1.0 else 0.0 }
      else (base intersect got).size.toDouble / base.size
    val region = exact.filter { case (q, n) =>
      corrected.contains(q) || corrected.contains(n)
    }
    // region recall against `got` as a whole is correct: a region
    // pair found anywhere in the dump is served. An EMPTY region set
    // (no exact top-k pair touches a corrected id — small corpus or
    // sparse kill bucket) is a VACUOUS pass, not recallOf's
    // empty-base⇒0.0: that rule exists for the FULL baseline, where
    // an empty base against a non-empty dump means a leak; here it
    // would fail the gate at 0.0 with nothing to verify (ADVICE r15).
    val regionRecall =
      if (region.isEmpty) {
        System.err.println(s"[verify] $correctionIdx corrected-region " +
          "pair set is empty (no exact pair touches a corrected id) — " +
          "vacuous pass")
        1.0
      } else (region intersect got).size.toDouble / region.size
    Seq(correctionIdx -> AnnGate(recallOf(exact), correctionFloor),
      s"${correctionIdx}_region" ->
        AnnGate(regionRecall, correctionRegionFloor))
  }

  /** Dropped-id recall of the q71 dump vs the exact q45 survivor set
    * (from this run's q45 dump when selected, else computed live).
    * Returns None when q71 wasn't dumped (already failing) or isn't in
    * this run. Recall −1 = the dump dropped a vector the exact answer
    * keeps — impossible for a healthy build (candidates are
    * exact-verified), so it means the dump or the index artifacts are
    * corrupt; always below floor. */
  private def dedupGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String]): Option[(String, AnnGate)] = {
    if (!selected.contains(dedupIdx)) return None
    val dumpDir = new java.io.File(s"$outDir/$dedupIdx")
    if (!dumpDir.exists()) return None
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val annSurv =
      try ids(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $dedupIdx dump unreadable, recall skipped: " +
            e.getMessage)
        return None
      }
    // the EXACT side is isolated like residualEntry's live-q65 floor:
    // a broken q45 dump or a throwing exact screen makes q71's recall
    // UNVERIFIABLE — that costs q71 its dump (unverifiable ≠ pass),
    // never an abort that cascades into enforceAnnGate deleting every
    // healthy ANN dump of the run
    val (exactSurv, all) =
      try {
        val exactDump = new java.io.File(s"$outDir/$dedupExact")
        val ex =
          if (selected.contains(dedupExact) && exactDump.exists())
            ids(spark.read.parquet(exactDump.toString))
          else ids(operators.Similarity.q45EmbedDedup(spark, sfDir))
        (ex, ids(sources.Tables.load(spark, sfDir, "embeddings")
          .select("vec_id")))
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] $dedupIdx recall baseline (exact $dedupExact) " +
            s"failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable recall is not a pass")
        deleteOrDie(dumpDir)
        return None
      }
    val exactDropped = all -- exactSurv
    val annDropped = all -- annSurv
    val falseDrops = annDropped -- exactDropped
    val recall =
      if (falseDrops.nonEmpty) {
        System.err.println(s"[verify] $dedupIdx dropped " +
          s"${falseDrops.size} vector(s) the exact answer keeps " +
          s"(e.g. ${falseDrops.take(3).mkString(", ")}) — the verify " +
          "stage is exact, so this is dump/index corruption")
        -1.0
      }
      else if (exactDropped.isEmpty) 1.0
      else (exactDropped & annDropped).size.toDouble / exactDropped.size
    Some(dedupIdx -> AnnGate(recall, dedupFloor))
  }

  /** Rejected-id recall of the q76 dump vs the exact batch-vs-corpus
    * screen (always computed live — the exact screen has no dump of
    * its own). Same isolation/deletion discipline as [[dedupGate]]. */
  private def screenGate(spark: SparkSession, sfDir: String,
      outDir: String, selected: Set[String]): Option[(String, AnnGate)] = {
    if (!selected.contains(screenIdx)) return None
    val dumpDir = new java.io.File(s"$outDir/$screenIdx")
    if (!dumpDir.exists()) return None
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val admitted =
      try ids(spark.read.parquet(dumpDir.toString))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $screenIdx dump unreadable, recall skipped: " +
            e.getMessage)
        return None
      }
    val (exactRejected, batchIds) =
      try (ids(operators.IngestScreen.exactRejects(spark, sfDir)),
        ids(sources.Tables.load(spark, sfDir, "embeddings")
          .filter(operators.IngestScreen.batchPred).select("vec_id")))
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] $screenIdx recall baseline (exact screen) " +
            s"failed: ${e.getMessage}; deleting its dump — " +
            "unverifiable recall is not a pass")
        deleteOrDie(dumpDir)
        return None
      }
    val annRejected = batchIds -- admitted
    val falseRejects = annRejected -- exactRejected
    val recall =
      if (falseRejects.nonEmpty) {
        System.err.println(s"[verify] $screenIdx rejected " +
          s"${falseRejects.size} batch vector(s) the exact screen " +
          s"keeps (e.g. ${falseRejects.take(3).mkString(", ")}) — the " +
          "verify stage is exact, so this is dump/index corruption")
        -1.0
      }
      else if (exactRejected.isEmpty) 1.0
      else (exactRejected & annRejected).size.toDouble / exactRejected.size
    Some(screenIdx -> AnnGate(recall, screenFloor))
  }

  def annRecallGate(spark: SparkSession, sfDir: String, outDir: String,
      names: Iterable[String]): Map[String, AnnGate] = {
    val selected = names.toSet
    val dedupEntry = dedupGate(spark, sfDir, outDir, selected)
    val hybridEntry = hybridGate(spark, sfDir, outDir, selected)
    val screenEntry = screenGate(spark, sfDir, outDir, selected)
    val pipelineEntry = pipelineGate(spark, sfDir, outDir, selected)
    val deleteEntry = deleteGate(spark, sfDir, outDir, selected)
    val correctionEntries = correctionGate(spark, sfDir, outDir, selected)
    val gated =
      selected.filter(n => annFloors.contains(n) || n == annResidual).toSeq
    if (gated.isEmpty)
      return (dedupEntry ++ hybridEntry ++ screenEntry ++
        pipelineEntry ++ deleteEntry ++ correctionEntries).toMap
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // EAGER, deliberately (a lazy val here was tried and reverted):
    // recallOfDump wraps each dump read in a swallow-and-skip try, so
    // a lazily-forced baseline failure inside it would be
    // misattributed as "dump unreadable" and SKIPPED — the gated dump
    // would survive with unverifiable recall, the exact silent pass
    // the gate exists to prevent. Thrown here, the failure aborts the
    // whole gate and enforceAnnGate's catch deletes every gated dump
    // (unverifiable ≠ pass), which VerifyGateSpec pins.
    val exact = pairs(operators.Similarity.q35KnnBrute(spark, sfDir))
    // vacuous-corpus guard: with an EMPTY exact baseline (a corpus of
    // zero/invalid vectors — n=0 states IndexStore and the ingest
    // stream explicitly support) recall is 0/0, and the NaN would flow
    // into ann_recall.json as non-RFC-8259 JSON. Empty-vs-empty agrees
    // (1.0, vacuous pass); any dumped pair against an empty baseline
    // is a wrong answer (0.0, hard fail).
    def recallOf(dumped: Set[(Long, Long)]): Double =
      if (exact.isEmpty) { if (dumped.isEmpty) 1.0 else 0.0 }
      else (exact intersect dumped).size.toDouble / exact.size
    val memo = scala.collection.mutable.Map.empty[String, Option[Double]]
    def recallOfDump(name: String): Option[Double] =
      memo.getOrElseUpdate(name, {
        val dir = new java.io.File(s"$outDir/$name")
        if (!dir.exists()) None
        // unreadable dump (the query threw mid-write and left an empty
        // dir): the query is already failing downstream as a broken
        // dump — skip its recall measurement rather than aborting the
        // whole verify artifact for every other query
        else try Some(recallOf(pairs(spark.read.parquet(dir.toString))))
        catch { case e: Throwable =>
          System.err.println(
            s"[verify] $name dump unreadable, recall skipped: ${e.getMessage}")
          None
        }
      })
    val staticEntries = gated.filter(annFloors.contains).sorted.flatMap {
      name => recallOfDump(name).map(r => name -> AnnGate(r, annFloors(name)))
    }
    // q68's floor: q65's recall from THIS run's dump when q65 was part
    // of this run, else measured live — a targeted q68 re-gate must
    // never read a stale q65 parquet from a prior run/build (the
    // pre-delete in main only clears SELECTED names). The floor
    // resolution is isolated so a broken q65 live run costs only q68's
    // verdict (dump deleted: unverifiable ≠ pass), never the four
    // static-floor measurements already in hand.
    val residualEntry =
      if (!gated.contains(annResidual)) None
      else recallOfDump(annResidual).flatMap { r =>
        try {
          val q65Recall = (if (selected.contains("q65_knn_ivfpq"))
            recallOfDump("q65_knn_ivfpq") else None).getOrElse(
            recallOf(pairs(operators.Similarity.q65KnnIvfPq(spark, sfDir))))
          // Lower-bound the dynamic floor at q65's STATIC floor: in a
          // targeted q68-only re-gate the live q65 measurement alone
          // sets the bar, so a shared-helper bug degrading BOTH paths
          // (q65 returns rows, recall ~0) would otherwise hand q68 a
          // near-zero floor and a trivial pass — the exact silent decay
          // this gate exists to catch.
          val floor = math.max(q65Recall, annFloors("q65_knn_ivfpq"))
          Some(annResidual -> AnnGate(r, floor))
        } catch { case e: Throwable =>
          System.err.println(
            s"[verify] $annResidual floor (live q65) failed: " +
              s"${e.getMessage}; deleting its dump — unverifiable " +
              "recall is not a pass")
          deleteOrDie(new java.io.File(s"$outDir/$annResidual"))
          None
        }
      }
    (staticEntries ++ residualEntry ++ dedupEntry ++ hybridEntry ++
      screenEntry ++ pipelineEntry ++ deleteEntry ++
      correctionEntries).toMap
  }

  /** Persisted-index twins: each maps to the in-query variant it must
    * match BIT-IDENTICALLY (IndexStore serves the same artifacts the
    * twin trains in-query; every aggregate is fixed-point and parquet
    * round-trips doubles exactly). */
  val idxTwins: Map[String, String] = Map(
    "q69_knn_ivfpq_idx"     -> "q65_knn_ivfpq",
    "q70_knn_ivfpq_res_idx" -> "q68_knn_ivfpq_res",
    // lexical index twin: q74 reads persisted postings/df/stats through
    // the same scoring tree q72 computes in-query. The ANN append
    // exemption below never applies to it — LexIndex has no append
    // path, so a fresh or validated lexical index always matches
    "q74_bm25_topk_idx"     -> "q72_bm25_topk")

  /** The twins covered by the ANN-index append exemption (see
    * [[enforceTwinIdentity]]): exactly the pairs served from the
    * [[operators.IndexStore]] artifacts that appendBatch can grow. */
  private val annTwins = Set("q69_knn_ivfpq_idx", "q70_knn_ivfpq_res_idx")

  /** Enforce the twin invariant on the dumps of THIS run: a
    * persisted-index dump that differs from its in-query twin's dump
    * in ANY row is deleted (hard driver FAIL). This is the detector
    * for the one freshness hole the corpus fingerprint + dial check
    * cannot see — a same-dial ALGORITHM change that forgot to bump
    * IndexStore.formatVersion would leave a stale-but-plausible
    * persisted index serving old results, and recall floors alone
    * could still pass it. Runs only when both twins were dumped by
    * this run (a targeted q69-only re-gate has no fresh twin to trust
    * — the recall floor still applies there).
    *
    * `indexDir` (when the caller knows it) adds the APPEND exemption:
    * bit-identity is promised only for a PURE build — an index grown
    * by appendBatch legitimately serves the pre-append centroids and
    * codebooks while the in-query twin retrains on the full corpus
    * (that amortization is the feature, and `ensure` validates the
    * appended index as current). Condemning it as "stale artifacts"
    * would hard-FAIL a healthy maintenance state, so when meta records
    * appended rows the identity check stands down and the recall
    * floors remain the gate. The driver's own gate always runs against
    * a fresh pure build (immutable testdata, rebuilt scratch), so the
    * exemption never weakens that path. */
  def enforceTwinIdentity(spark: SparkSession, outDir: String,
      names: Iterable[String], indexDir: Option[String] = None): Unit = {
    // The exemption trusts the index's self-reported meta, so it is
    // CAPPED by the one consistency invariant legit state always
    // satisfies (appended_n ≤ n — n counts appended rows too): meta
    // claiming more appends than indexed rows is corruption, and a
    // corrupted/doctored meta must not be able to stand down the
    // identity gate by merely asserting appends. Logged as a warning
    // either way — standing down a gate is an event, not housekeeping.
    // scoped to the ANN pairs: the lexical twin (q74) has no append
    // path, so an appended ANN index must not stand down ITS check
    val annExempt: Boolean =
      indexDir.flatMap(d => operators.IndexStore.appendState(spark, d))
        .exists { case (appended, n) =>
          if (appended > 0 && appended <= n) {
            System.err.println(s"[verify] WARNING: ANN twin identity " +
              s"skipped: index at ${indexDir.get} carries $appended " +
              s"appended rows of $n (pure-build identity does not " +
              "apply; recall floors still gate)")
            true
          } else {
            if (appended > 0)
              System.err.println(s"[verify] WARNING: index at " +
                s"${indexDir.get} self-reports an IMPLAUSIBLE append " +
                s"state ($appended appended > $n total) — exemption " +
                "refused, running the identity check")
            false
          }
        }
    val selected = names.toSet
    idxTwins.foreach { case (idx, live) =>
      if (selected.contains(idx) && selected.contains(live) &&
          !(annExempt && annTwins.contains(idx))) {
        val (iDir, lDir) =
          (new java.io.File(s"$outDir/$idx"), new java.io.File(s"$outDir/$live"))
        if (iDir.exists() && lDir.exists()) {
          val differs =
            try {
              // row→count MAP, not a Set: a duplicated row in one dump
              // (e.g. a double-insert regression — one of the failure
              // classes this detector exists for) must fail the
              // compare even when the distinct row sets match
              def rows(d: java.io.File) = spark.read.parquet(d.toString)
                .collect().map(_.toSeq).groupBy(identity)
                .map { case (r, g) => (r, g.size) }
              rows(iDir) != rows(lDir)
            } catch { case e: Throwable =>
              System.err.println(s"[verify] twin compare $idx vs $live " +
                s"unreadable (${e.getMessage}); failing $idx — " +
                "unverifiable identity is not a pass")
              true
            }
          if (differs) {
            System.err.println(s"[verify] $idx diverged from its " +
              s"in-query twin $live — the persisted index is serving " +
              "stale artifacts (same-dial algorithm change without a " +
              "formatVersion bump?); deleting its dump")
            deleteOrDie(iDir)
          }
        }
      }
    }
  }

  /** Measures the gate, DELETES every below-floor dump (the driver's
    * rows-check then records a hard FAIL — a missing dump — instead of
    * a silent rows-only pass), records all measured values in
    * `outDir/ann_recall.json`, and prints the verdicts. Returns the
    * measurements (VerifyGateSpec drives this end-to-end on a
    * deliberately degraded dump). */
  def enforceAnnGate(spark: SparkSession, sfDir: String, outDir: String,
      names: Iterable[String]): Map[String, AnnGate] = {
    // Locale.ROOT like Bench: the artifact must be valid JSON on a
    // comma-decimal-locale JVM too
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // stale-artifact rule (same as the dump pre-delete and Bench's
    // spread): when this run is responsible for gated queries, a prior
    // run's ann_recall.json must not survive a failed or empty gate to
    // impersonate this run's measurements
    if (names.exists(gatedNames.contains))
      try Files.deleteIfExists(Paths.get(s"$outDir/ann_recall.json"))
      catch { case _: Throwable => () }
    val gates =
      try annRecallGate(spark, sfDir, outDir, names)
      catch { case e: Throwable =>
        // The gate MACHINERY failed (q35 exact top-k or the live q65
        // floor threw): recall is unverifiable, and unverifiable must
        // not read as a pass — delete every gated dump (those queries
        // FAIL downstream) but let the other ~60 queries' artifact
        // survive instead of aborting main before oracle_sql.json.
        System.err.println(
          s"[verify] ann recall gate itself failed (${e.getMessage}); " +
            "deleting gated dumps — unverifiable recall is not a pass")
        names.filter(gatedNames.contains)
          .foreach(n => deleteOrDie(new java.io.File(s"$outDir/$n")))
        return Map.empty
      }
    gates.toSeq.sortBy(_._1).foreach { case (name, g) =>
      if (!g.pass) {
        System.err.println(
          s"[verify] $name failed: recall@${operators.Similarity.k} " +
            s"${f4(g.recall)} below floor ${f4(g.floor)}")
        deleteOrDie(new java.io.File(s"$outDir/${dumpNameOf(name)}"))
      }
    }
    if (gates.nonEmpty) {
      val gj = gates.toSeq.sortBy(_._1).map { case (name, g) =>
        s"""${Json.str(name)}: {"recall": ${f4(g.recall)}, """ +
          s""""floor": ${f4(g.floor)}, "pass": ${g.pass}}"""
      }.mkString("{", ", ", "}")
      Files.writeString(Paths.get(s"$outDir/ann_recall.json"), gj)
      println(s"[verify] ann recall gate: $gj")
    }
    gates
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — extra names restrict the
    // dump to those queries (targeted re-gating after a focused change;
    // pair with scripts/check_oracles.py --only). The driver's 2-arg
    // call is unchanged and dumps everything.
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    // a typo'd name would dump nothing, exit 0, and let check_oracles
    // pass against a STALE dump from a prior run — fail loudly instead
    val unknown = only.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query names: ${unknown.mkString(", ")}")
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    // pre-delete each selected dump: a query that THROWS must surface
    // as a missing dump (FAIL) downstream, not as its stale
    // previous-run parquet silently passing the compare
    selected.keys.foreach { name =>
      deleteOrDie(new java.io.File(s"$outDir/$name"))
    }
    // Dump in parallel: Spark happily runs jobs from several submitter
    // threads (FIFO scheduler), queries touch disjoint output dirs and
    // per-query-keyed scratch paths, and local[32] has far more slots
    // than any single sf0.01 query keeps busy — 4 in flight cuts the
    // full-gate wall-clock to roughly the sum of the 3-4 heaviest
    // queries. GRAFT_VERIFY_PARALLEL=1 restores strictly sequential
    // dumps (debugging a query in isolation).
    //
    // NOTE on the write shape: `.coalesce(1)` is GATE-ONLY layout — it
    // collapses each (tiny, sf0.01) result to one file so the driver's
    // DuckDB read is trivial. It is NOT the production write path:
    // ParquetSink writes partitioned output; collapsing a real result
    // to one task would serialize the whole write at cluster scale.
    val parRaw = sys.env.getOrElse("GRAFT_VERIFY_PARALLEL", "4")
    // fail fast naming the knob (same pattern as -Dgraft.ann.nprobe):
    // a malformed value must not surface as a bare NumberFormatException
    // before any dump runs
    val par = math.max(1,
      try parRaw.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"GRAFT_VERIFY_PARALLEL must be an integer, got '$parRaw'")
      })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    try {
      val tasks = selected.toSeq.map { case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()

    // twin identity BEFORE the recall gate: a diverged q69/q70 dump is
    // deleted here, and the gate then simply skips its missing dump
    enforceTwinIdentity(spark, outDir, selected.keys,
      Some(operators.IndexStore.dirFor(spark, sfDir)))
    enforceAnnGate(spark, sfDir, outDir, selected.keys)

    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
