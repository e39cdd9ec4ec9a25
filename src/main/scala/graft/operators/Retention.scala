package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The user-facing retention / right-to-be-forgotten entry point —
  * the operational form of the lifecycle the gated pipelines
  * demonstrate (q79/q80 erase, q81/q82 rectification): one call
  * forgets a set of ids across EVERY persisted store of a corpus.
  *
  * The reference cannot express this at all — its MERGE updates or
  * inserts but never deletes (reference df_to_azure/db.py:36-53), and
  * its stores are SQL Server tables where deletion is the database's
  * problem. Here the corpus owns derived stores (lexical postings,
  * ANN codes, veclists, streaming dedup indexes), so "forget" must
  * compose each store's own deletion discipline:
  *
  *  - documents: [[LexIndex.deleteDocs]] — tombstones + EXACT
  *    negative df/stats partials + corpus rewrite; post-delete BM25
  *    is bit-identical to a survivor rebuild from that instant.
  *  - embeddings: [[IndexStore.deleteBatch]] — tombstones + corpus
  *    rewrite; every ANN candidate stream and the veclists screen
  *    anti-join the tombstones from that instant.
  *  - physical removal (`foldNow = true`): [[LexIndex.compact]] and
  *    [[graft.sources.Maintenance.compactAnnIndex]] fold the
  *    tombstones out of the postings/codes and clear the sidecars —
  *    the step that also licenses re-admitting a forgotten id
  *    (rectification). Default false: production folds ride the
  *    compaction cadence and amortize over many forgets, exactly as
  *    the append-side delta folds do.
  *
  * Idempotent end to end: already-tombstoned and already-absent ids
  * are skipped by the stores themselves, so replaying a forget (crash
  * recovery, an at-least-once job runner) converges with zero double
  * effects. Crash windows are each store's own, all healable (see
  * their deletion sections). Concurrency: each store call takes its
  * writer lease, and the corpus rewrites additionally take the
  * corpus-dir lease the streaming sinks hold around their appends —
  * a forget can run against a live ingest stream and they serialize.
  *
  * Stores that were never built are skipped (an index-less corpus is
  * a plain filter — deleting derived state that does not exist is a
  * no-op, not an error), so `forget` is safe on a corpus where only
  * one of the two tables has an index. */
object Retention {

  final case class ForgetStats(
      docsTombstoned: Long, docsRemovedFromCorpus: Long,
      vecsTombstoned: Long, vecsRemovedFromCorpus: Long,
      foldedLex: Boolean, foldedAnn: Boolean)

  /** Forget explicit id sets. `docIds` needs a `doc_id` column,
    * `vecIds` a `vec_id` column; pass None for a side that has
    * nothing to forget. */
  def forget(spark: SparkSession, corpusDir: String,
      docIds: Option[DataFrame] = None,
      vecIds: Option[DataFrame] = None,
      foldNow: Boolean = false): ForgetStats = {
    val lexDir = LexIndex.dirFor(spark, corpusDir)
    val annDir = IndexStore.dirFor(spark, corpusDir)
    val (dT, dR) = docIds match {
      case Some(ids) if LexIndex.hasIndex(spark, lexDir) =>
        val st = LexIndex.deleteDocs(spark, corpusDir,
          ids.select(col("doc_id")))
        (st.tombstoned, st.removedFromCorpus)
      case Some(_) =>
        // no lexical index: the corpus table alone still must forget.
        // An id-less rewrite through the same shadow+promote +
        // corpus-lease discipline the indexed path uses would deserve
        // its own surface; refusing loudly is safer than silently
        // deleting only the indexed side — build the index (cheap
        // relative to owning a corpus) or filter the table directly.
        throw new IllegalStateException(
          s"no lexical index at $lexDir — Retention.forget composes " +
            "each store's deletion lifecycle; for an index-less " +
            "corpus filter the table directly (a plain rewrite), or " +
            "LexIndex.ensure first")
      case None => (0L, 0L)
    }
    val (vT, vR) = vecIds match {
      case Some(ids) if IndexStore.hasIndex(spark, annDir) =>
        val st = IndexStore.deleteBatch(spark, corpusDir,
          ids.select(col("vec_id")))
        (st.tombstoned, st.removedFromCorpus)
      case Some(_) =>
        throw new IllegalStateException(
          s"no ANN index at $annDir — Retention.forget composes each " +
            "store's deletion lifecycle; for an index-less corpus " +
            "filter the table directly, or IndexStore.ensure first")
      case None => (0L, 0L)
    }
    val (fl, fa) =
      if (!foldNow) (false, false)
      else (
        docIds.nonEmpty && {
          LexIndex.compact(spark, corpusDir); true
        },
        vecIds.nonEmpty && {
          graft.sources.Maintenance.compactAnnIndex(spark, annDir); true
        })
    ForgetStats(dT, dR, vT, vR, fl, fa)
  }

  /** Forget by PREDICATE — the retention-policy form ("older than the
    * cutoff", "flagged source", "quality below floor"). The predicate
    * is evaluated over the CURRENT corpus tables, so a replay after
    * the rewrite sees an empty kill set and no-ops — the same
    * convergence rule the gated pipelines pin. */
  def forgetWhere(spark: SparkSession, corpusDir: String,
      docPred: Option[Column] = None,
      vecPred: Option[Column] = None,
      foldNow: Boolean = false): ForgetStats =
    forget(spark, corpusDir,
      docPred.map(p => Tables.load(spark, corpusDir, "documents")
        .filter(p).select(col("doc_id"))),
      vecPred.map(p => Tables.load(spark, corpusDir, "embeddings")
        .filter(p).select(col("vec_id"))),
      foldNow)
}
