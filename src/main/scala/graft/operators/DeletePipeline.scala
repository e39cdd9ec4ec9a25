package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q79/q80: the DELETION lifecycle, composed end-to-end — the
  * retention / right-to-be-forgotten pass a production corpus runs,
  * chained through the engine's REAL persisted interfaces exactly like
  * q78 composes the ingest side:
  *
  *  1. SEED: the source documents + embeddings tables become a
  *     standing corpus in engine-managed scratch (idempotent; a
  *     `_seed` marker carrying the SOURCE identity reseeds when the
  *     source changes — q78's discipline), with its persisted lexical
  *     index ([[LexIndex.ensure]]) and ANN index
  *     ([[IndexStore.ensure]]);
  *  2. DELETE: a deterministic kill-set (the portable salted-md5
  *     bucket, [[graft.functions.TextFunctions.saltedBucket]] — the
  *     q43/q52 idiom, so the DuckDB oracle can state the SAME set)
  *     goes through [[LexIndex.deleteDocs]] and
  *     [[IndexStore.deleteBatch]]: tombstones stamped, negative
  *     partials appended, corpus tables rewritten — each store's own
  *     crash discipline (see their deletion sections);
  *  3. SERVE: the standard gated queries run against the deleted
  *     corpus THROUGH the tombstone-aware read paths —
  *     - q79 ([[q79DeleteLex]]): BM25 top-k via the persisted lexical
  *       index. Negative df/stats partials subtract EXACTLY and the
  *       tf leg anti-joins tombstones, so the result is BIT-IDENTICAL
  *       to an index rebuilt on the survivors — which is why this leg
  *       carries a full DuckDB HASH ORACLE (BM25 over `documents`
  *       minus the kill predicate), the strongest gate class;
  *     - q80 ([[q80DeleteAnn]]): IVF×PQ top-k via the persisted ANN
  *       index, ghost codes excluded from the candidate stream.
  *       Approximate ⇒ gated on recall vs the exact survivor top-k
  *       (Verify's deletion gate), PLUS a zero-tolerance leak check:
  *       a tombstoned id appearing as a neighbor is a hard fail.
  *
  * Re-runs admit nothing, delete nothing and serve identical bytes:
  * the kill predicate evaluated over the already-rewritten corpus is
  * empty, already-tombstoned ids are skipped, and both ensures ride
  * their validation tokens.
  *
  * Scale note: the composition adds nothing beyond its stages — the
  * index-side deletes are tombstone appends (cost ∝ kill-set, fold
  * deferred to compaction), and the corpus rewrites are one
  * distributed scan-and-copy each, the operation a retention pass
  * pays on any store. nlistFor boundary: a kill fraction large enough
  * to shrink the √N cell count makes the next ensure RETRAIN — the
  * legitimate answer, same policy as append growth (observed at
  * sf0.1: 2000 → 1875 vectors crosses 31 → 30). */
object DeletePipeline {

  /** Kill-set dial: bucket [[killBucket]] of [[killMod]] salted-md5
    * buckets — ~1/16 of each table, portable to the oracle via
    * SparkEntry.bucketSql. */
  val killMod = 16
  val killBucket = 5
  def kill(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.saltedBucket(id, "kill", killMod) ===
      killBucket

  def pipeDirFor(spark: SparkSession, sfDir: String): String =
    graft.Scratch.stableDir(spark, "delpipe", sfDir)

  /** Scratch root of the CORRECTION pipeline (q81/q82) — the one
    * accessor Bench's cold pre-build deletes through, so the prefix
    * cannot silently diverge between the pipeline and its bench. */
  def corrPipeDirFor(spark: SparkSession, sfDir: String): String =
    graft.Scratch.stableDir(spark, "corrpipe", sfDir)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    fs.exists(p)
  }

  /** Source-table identity term (count + order-free xor fingerprint)
    * for a seed id. Shared with [[Sharded]] and [[EmbedPipeline]]
    * (same seed discipline). */
  private[operators] def sourceId(df: DataFrame, fpExpr: String): String = {
    val r = df.agg(count(lit(1)), expr(s"bit_xor($fpExpr)")).head()
    s"${r.getLong(0)}|${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  /** [[sourceId]] behind the table's FILE SIGNATURE (r18; the
    * Similarity.cachedCorpusCount pattern, blessed for q36 in r17's
    * advice close): every scratch-pipeline ensure (q78–q82, the
    * sharded store) re-derives the source fingerprint PER CALL for a
    * value that only moves when the table does — an O(corpus) scan
    * job each, ~13 per bench across the family. One driver-side
    * listing decides reuse; an appended/rewritten source changes its
    * signature and re-scans; an unreadable signature falls back to
    * the scan. The on-disk seed markers still carry the CONTENT
    * fingerprint, so cross-JVM reseed semantics are unchanged — this
    * only removes repeat scans within one JVM while the table holds
    * still.
    *
    * MTIME-RESOLUTION ASSUMPTION (ADVICE r18, documented contract): a
    * signature is (path, length, mtime) per current file — an in-place
    * rewrite that preserves every file's length AND lands within the
    * filesystem's mtime granularity would serve a stale id for the
    * rest of this JVM. That needs a same-length same-tick overwrite of
    * an immutable-by-convention parquet table (writers here always
    * create new part files); on filesystems exposing only whole-second
    * mtimes, operators replacing corpus files in place must touch or
    * rename, or bounce the JVM. Cross-JVM state is immune either way —
    * the seed markers are content-fingerprinted. */
  private[operators] def cachedSourceId(spark: SparkSession, sfDir: String,
      table: String, fpExpr: String): String = {
    val path = s"$sfDir/$table.parquet"
    def scan() = sourceId(Tables.load(spark, sfDir, table), fpExpr)
    graft.Scratch.fileSignature(spark, path) match {
      case None => scan()
      case Some(sig) =>
        val key = s"$path|$fpExpr"
        val hit = sourceIdCache.get(key)
        if (hit != null && hit._1 == sig) hit._2
        else {
          val v = scan()
          sourceIdCache.put(key, (sig, v))
          v
        }
    }
  }

  private val sourceIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** The ONE seed discipline both scratch pipelines (q79/q80's
    * delpipe, q81's corrpipe) run, so the reseed contract can never
    * drift between them:
    *  - a seed-identity mismatch wipes the scratch root AND the index
    *    homes (the homes are keyed by the corpus PATH, not the seed —
    *    a stale tombstone sidecar against a fresh seed would read as
    *    a "crashed delete" and ensure's heal would remove the OLD
    *    kill set from the NEW corpus);
    *  - the seed marker is written AFTER the data (a crash between
    *    reseeds — the safe direction, q78's rule). */
  private[operators] def ensureSeeded(spark: SparkSession, root: String,
      seedId: String, indexHomes: Seq[String])(dataPresent: => Boolean)(
      writeData: => Unit): Unit = {
    val (fs, seedP) = graft.Scratch.fs(spark, s"$root/_seed")
    val seedCurrent = fs.exists(seedP) &&
      (try new String(graft.Scratch.readSmallFile(fs, seedP),
        "UTF-8") == seedId
      catch { case scala.util.control.NonFatal(_) => false })
    if (!seedCurrent) {
      val (rfs, rp) = graft.Scratch.fs(spark, root)
      if (rfs.exists(rp)) rfs.delete(rp, true)
      indexHomes.foreach { d =>
        val (fs2, p2) = graft.Scratch.fs(spark, d)
        if (fs2.exists(p2)) fs2.delete(p2, true)
      }
    }
    if (!dataPresent) {
      writeData
      val out = fs.create(seedP, true)
      try out.write(seedId.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Seed + delete, idempotent; returns the scratch corpus dir the
    * serving queries read. Synchronized on the IndexStore lock like
    * q78 (Verify dumps from several threads; q79 and q80 share this
    * corpus). */
  private[graft] def ensureDeleted(spark: SparkSession,
      sfDir: String): String = IndexStore.synchronized {
    val root = pipeDirFor(spark, sfDir)
    val corpusDir = s"$root/c"
    val docsTable = s"$corpusDir/documents.parquet"
    val vecsTable = s"$corpusDir/embeddings.parquet"
    val srcDocs = Tables.load(spark, sfDir, "documents")
    val srcVecs = Tables.load(spark, sfDir, "embeddings")
    // SEED IDENTITY over BOTH source tables (q78's rule: ensure
    // validates index-vs-scratch, never scratch-vs-source). The KILL
    // DIALS are part of it: the scratch corpus is already rewritten
    // minus the old kill set, so a dial change must reseed —
    // otherwise the new delete stacks on the old one and the q79
    // oracle (which states only the NEW kill set) mismatches forever
    val seedId = s"graftdelpipe|1|$killMod|$killBucket|" +
      cachedSourceId(spark, sfDir, "documents", "xxhash64(doc_id, text)") +
      "|" +
      cachedSourceId(spark, sfDir, "embeddings",
        "xxhash64(vec_id, embedding)")
    ensureSeeded(spark, root, seedId,
      Seq(LexIndex.dirFor(spark, corpusDir),
        IndexStore.dirFor(spark, corpusDir)))(
      exists(spark, docsTable)) {
      srcDocs.write.mode(SaveMode.ErrorIfExists).parquet(docsTable)
      srcVecs.write.mode(SaveMode.ErrorIfExists).parquet(vecsTable)
    }
    // LEXICAL: ensure over the standing corpus, then delete. On a
    // replay the kill predicate over the already-rewritten corpus is
    // empty and deleteDocs no-ops (its corpus-pending probe also
    // completes a crashed predecessor's rewrite).
    LexIndex.ensure(spark, corpusDir)
    LexIndex.deleteDocs(spark, corpusDir,
      Tables.load(spark, corpusDir, "documents")
        .filter(kill(col("doc_id"))).select(col("doc_id")))
    // ANN: same sequence on the embeddings side
    IndexStore.ensure(spark, corpusDir)
    IndexStore.deleteBatch(spark, corpusDir,
      Tables.load(spark, corpusDir, "embeddings")
        .filter(kill(col("vec_id"))).select(col("vec_id")))
    corpusDir
  }

  /** q79: BM25 top-k served from the persisted lexical index AFTER the
    * deletion — bit-identical to a survivor rebuild (exact
    * subtraction), hash-checked against the DuckDB oracle computing
    * BM25 over `documents` minus the kill set. */
  def q79DeleteLex(spark: SparkSession, sfDir: String): DataFrame = {
    val corpusDir = ensureDeleted(spark, sfDir)
    LexIndex.q74Bm25TopKIdx(spark, corpusDir)
  }

  /** q80: IVF×PQ top-k served from the persisted ANN index AFTER the
    * deletion — tombstone-aware candidate stream; gated on recall vs
    * the exact survivor top-k plus the zero-leak check (Verify). */
  def q80DeleteAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val corpusDir = ensureDeleted(spark, sfDir)
    IndexStore.q69KnnIvfPqIdx(spark, corpusDir)
  }

  // --- q81: the CORRECTION (right-to-rectification) lifecycle -------------
  //
  // The full GDPR-rectification shape, which composes the three
  // lifecycle pieces nothing else exercises back to back: ERASE a
  // kill-set ([[LexIndex.deleteDocs]]: tombstones + negative partials
  // + corpus rewrite), physically FOLD it ([[LexIndex.compact]] — the
  // step that makes the ids re-addable; appendBatch refuses a
  // tombstoned id before the fold), then RE-ADMIT corrected versions
  // of those documents through the real append interfaces (corpus
  // append first, [[LexIndex.appendBatch]] second — a retrievable doc
  // is always a committed doc). Because every lexical fact is an
  // exact additive integer (postings, df, stats — subtraction and
  // re-addition are both exact), serving after the whole sequence is
  // BIT-IDENTICAL to an index rebuilt from scratch on the final
  // corpus, so q81 carries a full DuckDB hash oracle: BM25 over
  // `documents` with the kill bucket's text replaced by its corrected
  // form. The reference anchor is the same as q79's: its MERGE can
  // update or insert but never delete (reference df_to_azure/db.py:
  // 36-53), so "correct" there means overwrite-in-place; a store with
  // derived indexes must erase, fold and re-admit — this is that
  // operation, driver-gated.
  //
  // Stage sentinels (`_deleted`, `_corrected`, each written AFTER its
  // stage's data — the q78 marker rule) pin the progression so a
  // replay of a completed stage is a cheap no-op instead of a second
  // erase (the kill predicate keys on doc_id, which the corrected
  // docs KEEP — without the sentinel every replay would erase and
  // re-admit them again). Every crash window converges:
  //  - mid-erase → deleteDocs replays (idempotent), compact folds;
  //  - post-erase, pre-sentinel → deleteDocs no-ops (kill ids gone),
  //    compact re-runs content-preserving;
  //  - mid corpus append → the anti-join completes the missing rows,
  //    appendBatch's full-set ledger then applies postings once;
  //  - mid appendBatch → the ledger no-ops the replay and the next
  //    ensure heals the missing postings by rebuild (fp mismatch) —
  //    LexIndex's own crash contract, same answer;
  //  - even LOSING both sentinels converges: the erase removes the
  //    corrections, the append stage re-admits them, and the index
  //    side's ledger-hit no-op is healed by the next ensure's
  //    fingerprint rebuild — wasteful, never wrong.

  /** Deterministic corrected form — stated identically in the DuckDB
    * oracle (`concat('[v2] ', text)`). */
  val correctionPrefix = "[v2] "

  private def stamp(spark: SparkSession, path: String): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    fs.create(p, true).close()
  }

  /** Deterministic corrected form of a vector: negation — a content
    * change that keeps the norm (the index must re-key the id, and
    * the exact twin on the same corpus sees the identical doubles, so
    * no portability concern arises: q82 is recall-gated, not
    * SQL-oracled). HOF is CodegenFallback but runs only over the
    * batch-sized kill bucket, never the corpus. */
  private def correctedVec: org.apache.spark.sql.Column =
    expr("transform(embedding, x -> -x)")

  /** Seed + erase + fold + re-admit, idempotent; returns the scratch
    * corpus dir whose final content is `documents` with the kill
    * bucket's text corrected and `embeddings` with the kill bucket's
    * vectors corrected (negated). */
  private[graft] def ensureCorrected(spark: SparkSession,
      sfDir: String): String = IndexStore.synchronized {
    val root = corrPipeDirFor(spark, sfDir)
    val corpusDir = s"$root/c"
    val docsTable = s"$corpusDir/documents.parquet"
    val vecsTable = s"$corpusDir/embeddings.parquet"
    val srcDocs = Tables.load(spark, sfDir, "documents")
    val srcVecs = Tables.load(spark, sfDir, "embeddings")
    val seedId = s"graftcorrpipe|2|$killMod|$killBucket|" +
      cachedSourceId(spark, sfDir, "documents", "xxhash64(doc_id, text)") +
      "|" +
      cachedSourceId(spark, sfDir, "embeddings",
        "xxhash64(vec_id, embedding)")
    ensureSeeded(spark, root, seedId,
      Seq(LexIndex.dirFor(spark, corpusDir),
        IndexStore.dirFor(spark, corpusDir)))(
      exists(spark, docsTable)) {
      srcDocs.write.mode(SaveMode.ErrorIfExists).parquet(docsTable)
      srcVecs.write.mode(SaveMode.ErrorIfExists).parquet(vecsTable)
    }
    val deletedMark = s"$root/_deleted"
    val correctedMark = s"$root/_corrected"
    if (!exists(spark, deletedMark)) {
      LexIndex.ensure(spark, corpusDir)
      LexIndex.deleteDocs(spark, corpusDir,
        Tables.load(spark, corpusDir, "documents")
          .filter(kill(col("doc_id"))).select(col("doc_id")))
      // fold the tombstones physically — the step that licenses
      // re-adding the ids (appendBatch refuses a pending tombstone)
      LexIndex.compact(spark, corpusDir)
      // ANN leg, same sequence: tombstones + corpus rewrite, then the
      // compaction fold removes the ghost codes rows and the sidecar
      IndexStore.ensure(spark, corpusDir)
      IndexStore.deleteBatch(spark, corpusDir,
        Tables.load(spark, corpusDir, "embeddings")
          .filter(kill(col("vec_id"))).select(col("vec_id")))
      graft.sources.Maintenance.compactAnnIndex(spark,
        IndexStore.dirFor(spark, corpusDir))
      stamp(spark, deletedMark)
    }
    if (!exists(spark, correctedMark)) {
      val corr = srcDocs.filter(kill(col("doc_id")))
        .select(col("doc_id"),
          concat(lit(correctionPrefix), col("text")).as("text"))
      // corpus FIRST (idempotent: only the rows a crashed attempt did
      // not land), index second — the docs-sink commit order
      // generation-resolved read AND append INSIDE the corpus writer
      // lease (the Generations appender contract; ADVICE r17: the
      // IndexStore.synchronized wrapper only serializes THIS JVM —
      // two JVMs racing here could straddle a rewrite or double-run
      // the anti-join+append). Both tables share the corpus lease key
      // (leaseDirOf(<dir>/x.parquet) = <dir>, the docs-sink
      // discipline); one hold covers both appends — uncontended in
      // the common case, reentrant for the inner store calls
      graft.sources.WriterLease.withWrite(spark, corpusDir,
        "correct-append-docs") {
        val cur = graft.sources.Generations.resolve(spark, docsTable)
        val missing = corr.join(
          spark.read.parquet(cur).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        if (!missing.isEmpty)
          missing.write.mode(SaveMode.Append).parquet(cur)
      }
      // full-set batch: the ledger fingerprint is then stable across
      // replays whatever subset the corpus append had landed
      LexIndex.appendBatch(spark, corpusDir, corr)
      // ANN leg: corrected (negated) vectors re-enter through the
      // real append interface — fresh after the fold; a replay that
      // finds them already indexed no-ops through the re-key guard
      // (same content ⇒ same codes, bit for bit)
      val corrV = srcVecs.filter(kill(col("vec_id")))
        .select(col("vec_id"), correctedVec.as("embedding"))
      // same lease discipline as the docs leg above
      graft.sources.WriterLease.withWrite(spark, corpusDir,
        "correct-append-vecs") {
        val cur = graft.sources.Generations.resolve(spark, vecsTable)
        val missingV = corrV.join(
          spark.read.parquet(cur).select(col("vec_id")),
          Seq("vec_id"), "left_anti")
        if (!missingV.isEmpty)
          missingV.write.mode(SaveMode.Append).parquet(cur)
      }
      IndexStore.appendBatch(spark,
        IndexStore.dirFor(spark, corpusDir), corrV)
      stamp(spark, correctedMark)
    }
    corpusDir
  }

  /** q81: BM25 top-k served from the persisted lexical index after
    * erase → fold → corrected re-admission — bit-identical to a
    * rebuild on the final corpus (exact subtraction + exact
    * re-addition), hash-checked against the DuckDB oracle stating
    * BM25 over `documents` with the kill bucket's text corrected. */
  def q81CorrectionLex(spark: SparkSession, sfDir: String): DataFrame = {
    val corpusDir = ensureCorrected(spark, sfDir)
    LexIndex.q74Bm25TopKIdx(spark, corpusDir)
  }

  /** q82: IVF×PQ top-k served from the persisted ANN index after the
    * SAME erase → compaction fold → corrected re-admission — the
    * trained-artifact store's rectification leg, where "corrected"
    * means the codes tables must serve the NEW geometry for the
    * re-keyed ids. Approximate ⇒ recall-gated vs the exact top-k on
    * the final (corrected) corpus, with the corrected-region recall
    * recorded alongside (Verify.correctionGate). */
  def q82CorrectionAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val corpusDir = ensureCorrected(spark, sfDir)
    IndexStore.q69KnnIvfPqIdx(spark, corpusDir)
  }
}
