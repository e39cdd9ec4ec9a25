package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [[IndexStore.appendBatch]]'s refusal of a batch that re-adds a
  * TOMBSTONED (deleted, not yet folded) vec_id. Its prescribed
  * recovery differs from every other refusal — the FOLD
  * ([[graft.sources.Maintenance.compactAnnIndex]]), not an ensure()
  * that would validate the refusing state and hand a retry the same
  * refusal forever — so the streaming sinks dispatch on this TYPE;
  * a message-substring dispatch broke silently on any rewording
  * (review r17). Extends IllegalStateException so existing catch
  * clauses keep working. */
final class TombstonedReAddException(msg: String)
  extends IllegalStateException(msg)

/** One row of `<indexDir>/meta` — corpus identity + the dial values
  * the persisted artifacts were built under (see
  * [[IndexStore.ensure]]'s freshness contract). Top-level, not nested
  * in the object: nested-in-object case classes break the codegen'd
  * product encoder (Janino cannot resolve the accessor). */
private[operators] final case class AnnIndexMeta(version: Int, n: Long,
  fp: Long, nl: Int, res_norm: Double, appended_n: Long, subspaces: Int,
  pq_codes: Int, lloyd_iters: Int, pq_lloyd_iters: Int,
  app_res_sum: Double)

/** Persisted build-once / query-many ANN index (the FAISS
  * train/add/search lifecycle, re-expressed as parquet tables + joins).
  *
  * [[Similarity.q65KnnIvfPq]] and [[Similarity.q68KnnIvfPqRes]] are
  * correct but train their coarse quantizer and PQ codebooks inside
  * every query — ~80% of their wall-clock is index BUILD that a real
  * deployment pays once and amortizes over every query thereafter.
  * This store is that seam:
  *
  *  - [[build]] trains the IVF×PQ artifacts exactly once — the SAME
  *    pipeline q65/q68 run in-query ([[Similarity.kmeansCentroids]],
  *    [[Similarity.pqCodebook]], [[Similarity.pqAssign]],
  *    [[Similarity.residualSubVectors]] — one definition, so the
  *    persisted index can never drift from the in-query one) — and
  *    writes them as parquet tables:
  *      `centroids`  (cell, cv, cn)            — nlistFor(N) rows
  *      `codebook`   (sub, code, cv, cn)       — 8×16 rows (raw PQ)
  *      `codes`      (vec_id, nrm, sub, code)  — 8 rows/vector,
  *                   partitioned BY CELL on disk
  *      `rcodebook`  (sub, code, cv, cn)       — residual PQ
  *      `rcodes`     (vec_id, sub, code)       — partitioned by cell
  *      `meta`       one row: corpus fingerprint + the dial values the
  *                   artifacts were built under
  *    The codes tables are `partitionBy("cell")`: a query touches only
  *    its probed cells, so at 100 TB the scan reads the probed
  *    partitions' files — the on-disk analogue of the probed-cell-only
  *    join, and dynamic partition pruning keeps it true in-plan.
  *  - [[q69KnnIvfPqIdx]] / [[q70KnnIvfPqResIdx]] answer from the
  *    PERSISTED tables only — no Lloyd rounds, no N-row training scan;
  *    the corpus is touched just for the bounded query batch and the
  *    shortlist re-rank. Both are BIT-IDENTICAL to their in-query
  *    twins (q65/q68): the artifacts are the same doubles (parquet
  *    round-trips IEEE754 exactly) and the query side is the same
  *    expressions — IndexStoreSpec pins equality row for row.
  *  - [[appendBatch]] is the incremental-maintenance path: NEW vectors
  *    are assigned to the EXISTING cells/codebooks (one
  *    [[Similarity.homeCells]] + two [[Similarity.pqAssign]] passes
  *    over the batch — cost ∝ batch, no retrain) and appended to the
  *    codes tables. Replay-idempotent like the q59 ingest: already
  *    indexed vec_ids are anti-joined out, so a crashed-and-replayed
  *    append never double-inserts. The returned STALENESS metric (mean
  *    residual norm of the batch vs the build-time baseline stored in
  *    `meta`) is the retrain signal: residual norm is exactly what the
  *    coarse quantizer failed to express, so a drifting corpus shows
  *    up as batches whose residuals grow past the baseline (≥ ~1.5×
  *    says the cells no longer describe the data; rebuild).
  *
  * Freshness contract: [[ensure]] validates the persisted index
  * against the CURRENT corpus (order-independent xor fingerprint over
  * the indexable rows — one scan, no second count) and against the
  * CURRENT dial values (nlistFor/pq geometry/Lloyd rounds — a dial
  * change invalidates the artifacts it shaped), rebuilding on any
  * mismatch. An algorithm change that keeps all dials equal must bump
  * [[formatVersion]] — the one manual freshness obligation, called out
  * here because a stale-but-plausible index is the failure mode this
  * store must never serve. Fingerprints xor-compose, so an index
  * maintained by [[appendBatch]] matches `ensure` of the grown corpus
  * exactly — incremental maintenance and freshness validation agree.
  * A persisted validation token (file-listing digest, [[stateDigest]])
  * lets repeated stateless ensures of an UNCHANGED corpus+index skip
  * the O(corpus) scan; any observable on-disk change falls back to the
  * full validation, so the token changes the cost of the unchanged
  * path, never the rebuild guarantees.
  *
  * Crash safety: [[build]] assembles the whole index in a
  * per-attempt-unique shadow directory and promotes it live with the
  * same two-rename pattern as [[graft.sources.ParquetSink.swapInto]]
  * — a crash at any instant leaves a complete index on disk (live or
  * at `__old`), never a half-built one, and two builders (even in
  * different JVMs, which share no lock) can never interleave parquet
  * output inside one shadow. [[appendBatch]] appends codes first,
  * rcodes second, and swaps `meta` last: a crash in either window
  * leaves appended rows invisible to the fingerprint, which the next
  * `ensure` detects as a mismatch and repairs by rebuild, and the
  * anti-join keeps a replayed append from double-inserting. The
  * codes→rcodes window additionally leaves the index TORN (q69 serves
  * the rows, q70 skips them); a replayed append detects exactly that
  * state, re-derives the missing rcodes rows (reported as
  * `AppendStats.repaired`), and refuses loudly when the torn ids are
  * not in its batch and so cannot be repaired locally. The
  * rcodes→meta window converges by REBUILD, not incremental repair —
  * deliberately: a replayed append sees its rows in both tables and
  * no-ops, and it must NOT "complete" the missing meta write, because
  * an uncounted batch is indistinguishable from a replayed COMPLETED
  * batch when a DIFFERENT append crashed uncounted (xoring the wrong
  * batch's fingerprint into meta would corrupt it — xor REMOVES an
  * already-counted batch). The state is always detected: before the
  * ingest's corpus append the count-vs-meta.n probe leg sees it;
  * after, the corpus fingerprint mismatches.
  *
  * Concurrency contract (same as [[graft.sources.Maintenance]]):
  * REBUILDS AND APPENDS RUN QUIESCED — no q69/q70 mid-flight.
  * In-JVM callers serialize on [[ensure]]'s lock, but the lock covers
  * validation+build, not a reader's subsequent query execution: a
  * rebuild's swap deletes the old directory while a concurrent
  * reader's tasks may still be scanning it (loud FileNotFoundException
  * task failure, never silent wrong data — the reader re-runs).
  * Steady-state concurrent QUERIES (the common case — no corpus
  * change, ensure validates and serves) never swap and are safe at
  * any parallelism.
  */
object IndexStore {

  /** Bump when the index ALGORITHM changes in a way the dial columns
    * of `meta` cannot see (e.g. a different Lloyd update rule).
    * v2: the indexable predicate tightened from nrm > 0 to
    * [[Similarity.validNorm]] (finite, positive) — a corpus holding a
    * NaN/Inf-component vector fingerprints differently, so a v1 index
    * over one must rebuild rather than validate.
    * v3: [[Similarity.kmeansCentroids]] trains sample-bound
    * (trainPerCell·nl cap) — below the cap (all gate scales) centroids
    * are bit-identical to v2, but a big-corpus v2 index would diverge
    * from the in-query twin, so force the rebuild. */
  val formatVersion = 3

  /** Advisory retrain threshold for [[AppendStats.drift]]. */
  val driftRetrainAt = 1.5

  final case class BuildInfo(dir: String, n: Long, nl: Int,
    builtNow: Boolean, buildSec: Double)

  /** Rebuild policy for [[ensure]]: beyond freshness (corpus identity +
    * dials), rebuild when the appends since the last build say the
    * trained artifacts no longer describe the data —
    *  - `driftAt`: accumulated drift (appended-row-weighted mean
    *    residual norm ÷ build baseline, [[accumulatedDrift]]) at or
    *    above this ratio → the coarse cells have stopped expressing
    *    the corpus; rebuild.
    *  - `appendFractionAt`: appended_n / n at or above this fraction →
    *    even drift-free growth eventually deserves a retrain (cells
    *    sized for the build-time corpus, codebooks that never saw half
    *    the data); rebuild.
    * A rebuild resets both counters (fresh baseline, appended_n = 0),
    * so a policy violation triggers exactly ONE rebuild, not one per
    * ensure.
    *  - `compactAtFilesPerCell`: LAYOUT policy, orthogonal to the two
    *    rebuild axes — every [[appendBatch]] lands a part-file sliver
    *    into each touched `cell=` partition, and a long-lived streaming
    *    ingest accumulates them exactly where the DPP-pruned q69/q70
    *    read path opens files. When any single cell's part-file count
    *    reaches this threshold, ensure runs
    *    [[graft.sources.Maintenance.compactAnnIndex]] (a
    *    content-preserving rewrite to one file per cell — results
    *    bit-identical, meta untouched, NOT a rebuild) so nobody has to
    *    remember to call it. The probe is a driver-side directory
    *    glob, no Spark job.
    *  - `foldAtTombstones`: DELETION-layout policy, the tombstone
    *    mirror of the sliver axis (VERDICT r15 #5) — every
    *    [[deleteBatch]] leaves pending tombstones that tombstone-aware
    *    serving anti-joins per query (~2.2 s over post-fold at 128k,
    *    DELETE_SCALE_r15) until a compaction folds them. When the
    *    sidecar's pending count reaches this threshold, ensure runs
    *    the same content-preserving [[graft.sources.Maintenance
    *    .compactAnnIndex]] (which folds tombstones physically and
    *    clears the sidecar — results bit-identical, the fold IS what
    *    compaction already does), so a delete-heavy deployment
    *    converges on cadence without a manual maintenance call. The
    *    tombstone-free common case pays one driver-side exists()
    *    probe, no Spark job. */
  final case class RebuildPolicy(driftAt: Double = driftRetrainAt,
      appendFractionAt: Double = 0.5,
      compactAtFilesPerCell: Int = 16,
      foldAtTombstones: Long = Long.MaxValue)

  /** @param appended rows actually indexed (0 on a pure replay)
    * @param repaired rows whose rcodes were re-derived because a prior
    *                 append crashed between the codes and rcodes writes
    *                 (torn index — q70 was silently skipping them); > 0
    *                 tells the caller a crash window was healed
    * @param drift    batch mean residual norm ÷ build baseline — None
    *                 when nothing was appended or repaired. > 1 means
    *                 the batch sits farther from the trained centroids
    *                 than the build corpus did; ≥ [[driftRetrainAt]]
    *                 advises a rebuild. */
  final case class AppendStats(appended: Long, repaired: Long,
      drift: Option[Double]) {
    def retrainAdvised: Boolean = drift.exists(_ >= driftRetrainAt)
  }

  /** Stable on-disk home of the index for one corpus dir (same
    * engine-managed-storage seam as [[graft.operators.Layout]]). */
  def dirFor(spark: SparkSession, sfDir: String): String =
    graft.Scratch.stableDir(spark, "annidx", sfDir)

  // --- corpus identity -------------------------------------------------------

  /** (indexable row count, xor fingerprint) in ONE corpus scan.
    * Indexable = [[Similarity.validNorm]] (positive AND finite norm),
    * the same rows q65/q68 train on and the same
    * rows [[appendBatch]] appends — zero/NaN/Inf-norm rows are
    * invisible to the index and so must be invisible to its
    * fingerprint, or a
    * replayed append containing one would xor it in twice (= out).
    * xor, not sum: order-independent, overflow-free under ANSI, and
    * incrementally maintainable (fp_new = fp_old ⊕ fp_batch). */
  private def countAndFingerprint(raw: DataFrame): (Long, Long) = {
    import graft.functions.VectorFunctions.dotD
    val v = col("embedding").cast("array<double>")
    // v is selected because validNorm's r19 length guard reads it
    val r = raw.select(col("vec_id"), col("embedding"), v.as("v"),
        sqrt(dotD(v, v)).as("nrm"))
      .filter(Similarity.validNorm)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(vec_id, embedding))"),
        countDistinct(col("vec_id")))
      .head()
    // vec_id is the index key — refuse a duplicate-keyed corpus loudly
    // (same discipline as appendBatch). Silently proceeding would set
    // meta.n to the ROW count while codes hold DISTINCT ids, failing
    // the integrity probe's count leg on every ensure: an infinite
    // silent rebuild loop instead of one actionable error. (Identical
    // duplicate rows also xor-cancel OUT of the fingerprint, so the
    // fingerprint alone cannot see them.)
    require(r.getLong(2) == r.getLong(0),
      s"embeddings corpus contains ${r.getLong(0) - r.getLong(2)} " +
        "duplicate vec_id rows — vec_id is the index key; deduplicate " +
        "the corpus before indexing")
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // --- meta ------------------------------------------------------------------

  /** Read a tiny promoted-meta table with a BOUNDED retry over the
    * promote's two-rename window: a read landing between "live renamed
    * aside" and "shadow renamed in" sees a missing/partial dir for a
    * few ms — concluding "absent" there would trigger a FULL rebuild
    * of a healthy store. Genuine absence (no dir, no in-flight promote
    * debris) returns None on the first attempt, as before. Shared by
    * the ANN meta, the lexical meta and the veclists meta (identical
    * promote discipline). */
  private[operators] def readPromotedMeta[T](spark: SparkSession,
      metaPath: String, tag: String)(read: => T): Option[T] = {
    var left = 3
    while (true) {
      val (fs, p) = graft.Scratch.fs(spark, metaPath)
      val midPromote = fs.exists(new org.apache.hadoop.fs.Path(
        metaPath + "__shadow")) || fs.exists(new org.apache.hadoop.fs.Path(
        metaPath + "__old"))
      if (!fs.exists(p)) {
        if (!midPromote || left == 0) return None
      } else {
        try return Some(read)
        catch { case e: Throwable =>
          if (left == 0) {
            System.err.println(s"[$tag] unreadable meta at $metaPath: " +
              s"${e.getMessage}; treating store as absent")
            return None
          }
        }
      }
      left -= 1
      Thread.sleep(100)
    }
    None
  }

  private[operators] def readMeta(spark: SparkSession, dir: String)
      : Option[AnnIndexMeta] = {
    import spark.implicits._
    readPromotedMeta(spark, s"$dir/meta", "annidx")(
      spark.read.parquet(s"$dir/meta").as[AnnIndexMeta].head())
  }

  /** Shadow-write + promote of `<dir>/meta` (see [[graft.sources
    * .ParquetSink.promote]] for the first-write rename caveats). */
  private def writeMeta(spark: SparkSession, dir: String,
      m: AnnIndexMeta): Unit = {
    import spark.implicits._
    val shadow = s"$dir/meta__shadow"
    Seq(m).toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(shadow)
    val (fs, sp) = graft.Scratch.fs(spark, shadow)
    // fence at the COMMIT point: the shadow write above is invisible;
    // this promote is what makes the new meta the store's truth (a
    // no-op when this JVM holds no lease on `dir` — shadow-dir calls
    // during build, heal paths, specs)
    graft.sources.WriterLease.verify(spark, dir)
    graft.sources.ParquetSink.promote(fs, sp,
      new org.apache.hadoop.fs.Path(s"$dir/meta"))
  }

  /** Were `m`'s artifacts shaped by the CURRENT format + dial values?
    * Shared by [[current]] and [[appendBatch]]'s guard: encoding a
    * batch against a codebook built under different dials (say,
    * pqSubspaces 8→16 — the joins would silently drop half the
    * subvectors) must be refused, not "succeed" and be discarded by
    * the next ensure's rebuild. */
  private def dialsMatch(m: AnnIndexMeta): Boolean =
    m.version == formatVersion &&
      m.subspaces == Similarity.pqSubspaces &&
      m.pq_codes == Similarity.pqCodes &&
      m.lloyd_iters == Similarity.lloydIters &&
      m.pq_lloyd_iters == Similarity.pqLloydIters

  /** Does `m` describe an index the CURRENT code + corpus would build?
    * Any mismatch — corpus content, dial values, format — means the
    * artifacts are stale and must not be served. `tombN`/`tombXor`
    * fold pending deletions into the expectation (see the deletion
    * section): the corpus legitimately reads meta MINUS the valid
    * tombstones. The nlist check runs on the OBSERVED corpus size — a
    * delete (or append) that crosses an nlistFor boundary makes a
    * retrain the legitimate answer, exactly the maintenance policy. */
  private def current(m: AnnIndexMeta, n: Long, fp: Long,
      tombN: Long = 0L, tombXor: Long = 0L): Boolean =
    dialsMatch(m) && (m.n - tombN) == n && (m.fp ^ tombXor) == fp &&
      m.nl == Similarity.nlistFor(n)

  /** Accumulated drift of every append since the last build:
    * appended-row-weighted mean residual norm ÷ build baseline (the
    * integral of the per-batch [[AppendStats.drift]] readings). None
    * until something was appended. */
  private[operators] def accumulatedDrift(m: AnnIndexMeta): Option[Double] =
    if (m.appended_n > 0 && m.res_norm > 0)
      Some((m.app_res_sum / m.appended_n) / m.res_norm)
    else None

  private def policyViolated(m: AnnIndexMeta, p: RebuildPolicy): Boolean =
    accumulatedDrift(m).exists(_ >= p.driftAt) ||
      (m.n > 0 && m.appended_n.toDouble / m.n >= p.appendFractionAt)

  // --- validation token ------------------------------------------------------

  private[operators] val tokenName = "vtoken"

  /** Digest of the on-disk state a full `ensure` validation vouched
    * for: the corpus's and the index dir's recursive file listings
    * (path, length, mtime — sorted, so iteration order is irrelevant)
    * plus the dial values and format version. Any file created,
    * removed, resized or re-stamped under either root — a corpus
    * append, an appendBatch, a compaction, a doctored meta — changes
    * the digest, so a persisted token matching the CURRENT digest
    * proves nothing observable moved since the last full validation
    * and the O(corpus) fingerprint scan + integrity probe can be
    * skipped. The window this cannot see — an in-place rewrite that
    * preserves every path, length AND mtime — requires deliberately
    * forged filesystem state, the same trust class as editing `meta`
    * itself; any ordinary writer (Spark, the ingest sinks, a shell
    * `cp`) lands new part-file names or new mtimes. CAVEAT for stores
    * with coarse mtime granularity (~1 s on some object stores): a
    * same-length in-place overwrite completed within one mtime tick of
    * the original write is indistinguishable from "unchanged" for the
    * BULK tables — for the `meta` table, the semantic core (dials,
    * counters, corpus fingerprint), the digest additionally folds in
    * the FULL FILE CONTENT (meta is one row, ~1 KB — one driver-side
    * read per ensure, still no Spark job), so a same-length same-tick
    * meta rewrite can never slip under the token. If the remaining
    * codes-file trust class is too weak for a deployment, disable the
    * token (delete `vtoken`; every ensure then re-validates in full)
    * or front the store with one that reports sub-second mtimes.
    * Driver-side metadata listing only: no Spark job, no data read
    * beyond the ~1 KB meta files. */
  private def stateDigest(spark: SparkSession, sfDir: String,
      dir: String): String =
    listingDigest(spark, s"$sfDir/embeddings.parquet", dir,
      s"v$formatVersion|${Similarity.pqSubspaces}|" +
        s"${Similarity.pqCodes}|${Similarity.lloydIters}|" +
        s"${Similarity.pqLloydIters}")

  /** The generic core of [[stateDigest]], shared with [[LexIndex]]
    * (identical trust model, different corpus file and dial line):
    * digests the corpus file's and the index dir's recursive listings
    * plus the caller's dial line, folding in the CONTENT of small
    * files under `<dir>/meta`. Both stores name their token file
    * [[tokenName]], which the walk skips by construction. */
  private[operators] def listingDigest(spark: SparkSession,
      corpusFile: String, dir: String, dialsLine: String): String = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(root: String, contentRoot: Option[String]): Unit = {
      val (fs, p) = graft.Scratch.fs(spark, root)
      if (!fs.exists(p)) { entries += s"ABSENT:$root"; return }
      val contentPrefix = contentRoot
        .map(cr => fs.makeQualified(
          new org.apache.hadoop.fs.Path(cr)).toString + "/")
      // Generations.walkCurrentFiles (plain listStatus recursion), NOT
      // fs.listFiles: the located-status iterator resolves block
      // locations per file at ~7 ms each on LocalFileSystem — 0.55 s
      // for a 74-file index, when the whole point of the token path is
      // to be cheap. Generation-aware so that RETIRED generations (and
      // their TTL GC) are digest-invisible — the digest vouches for
      // current content, and a retention GC must never invalidate a
      // token over state no reader serves. (Absorbed-but-retained
      // delta files DO count until reaped — their reap forces one
      // conservative revalidation, same class as stranded __shadow
      // debris.) The token itself must not feed its own digest
      // (writing it would invalidate it); everything else under the
      // index dir — meta, codes, even stranded __old/__shadow debris —
      // counts, conservatively forcing a full validation when present.
      graft.sources.Generations.walkCurrentFiles(fs, p).foreach { s =>
        if (!s.getPath.getName.startsWith(tokenName)) {
          val line = s"${s.getPath}|${s.getLen}|${s.getModificationTime}"
          // the 64 KiB bound keeps a pathological foreign file under
          // meta/ from turning the cheap path into a bulk read; an
          // oversized file still digests by listing entry, and a meta
          // REPLACED by an oversized one changes length/name anyway
          val content =
            if (s.getLen <= 65536 &&
                contentPrefix.exists(s.getPath.toString.startsWith(_)))
              try {
                val h = java.security.MessageDigest.getInstance("SHA-256")
                h.update(graft.Scratch.readSmallFile(fs, s.getPath))
                "|" + h.digest().map("%02x".format(_)).mkString
              } catch { case scala.util.control.NonFatal(e) =>
                // an unreadable meta file (swapped away mid-walk by a
                // concurrent compaction, foreign permissions) must act
                // like any other foreign state: a digest the token can
                // never match, forcing the conservative full
                // validation — never an ensure() that throws where the
                // listing-only digest would have fallen back
                s"|UNREADABLE:${e.getClass.getName}:${System.nanoTime()}"
              }
            else ""
          entries += line + content
        }
      }
    }
    walk(corpusFile, None)
    walk(dir, Some(s"$dir/meta"))
    entries += dialsLine
    val md = java.security.MessageDigest.getInstance("SHA-256")
    entries.sorted.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The token carries the digest AND a copy of the meta row: the
    * digest covers the meta file's own listing entry, so the embedded
    * copy is exactly as fresh as the digest match itself — and the
    * zero-job fast path never has to launch the parquet read of
    * `meta` (a Spark job) just to re-check dials it already vouched
    * for. Doubles round-trip through `toString`/`toDouble` exactly. */
  /** Token line = digest + a copy of meta + the tombstone fold terms
    * that were live at validation time. The digest covers the sidecar
    * files, so a matching digest vouches for the stored (tombN,
    * tombXor) without any Spark job — the zero-job fast path stays
    * zero-job under pending deletions. */
  private def tokenLine(digest: String, m: AnnIndexMeta,
      tombN: Long, tombXor: Long): String =
    s"$digest|${m.version}|${m.n}|${m.fp}|${m.nl}|${m.res_norm}|" +
      s"${m.appended_n}|${m.subspaces}|${m.pq_codes}|${m.lloyd_iters}|" +
      s"${m.pq_lloyd_iters}|${m.app_res_sum}|$tombN|$tombXor"

  private def readToken(spark: SparkSession, dir: String)
      : Option[(String, AnnIndexMeta, Long, Long)] = {
    val (fs, p) = graft.Scratch.fs(spark, s"$dir/$tokenName")
    if (!fs.exists(p)) return None
    val line =
      // shared EOF-draining read (graft.Scratch.readSmallFile): a
      // truncated one-read() line would fail the 14-part parse below
      // and silently disable the fast path
      try new String(graft.Scratch.readSmallFile(fs, p), "UTF-8").trim
      catch { case scala.util.control.NonFatal(_) => "" }
    val parts = line.split('|')
    if (parts.length != 14) None
    else try Some((parts(0), AnnIndexMeta(parts(1).toInt, parts(2).toLong,
      parts(3).toLong, parts(4).toInt, parts(5).toDouble, parts(6).toLong,
      parts(7).toInt, parts(8).toInt, parts(9).toInt, parts(10).toInt,
      parts(11).toDouble), parts(12).toLong, parts(13).toLong))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Best-effort: a failed/torn/garbled token write degrades to a full
    * validation on the next ensure (digest or parse mismatch), never
    * to serving stale state — so unlike meta there is no shadow/swap
    * ceremony. */
  private def writeToken(spark: SparkSession, dir: String,
      line: String): Unit =
    try {
      val (fs, p) = graft.Scratch.fs(spark, s"$dir/$tokenName")
      val out = fs.create(p, true)
      try out.write(line.getBytes("UTF-8")) finally out.close()
    } catch { case e: Throwable =>
      System.err.println(s"[annidx] token write failed at $dir " +
        s"(${e.getMessage}); next ensure will re-validate in full")
    }

  /** Are the codes tables present and consistent with `m`? Catches the
    * three states the corpus fingerprint CANNOT see, because the rows
    * involved are in neither the corpus nor `meta`: (a) a
    * compaction/swap crash that left a codes dir missing entirely
    * (meta still current → without this probe ensure would serve
    * FileNotFoundException forever), (b) a torn append whose rows
    * never reached the corpus (ghost codes rows, rcodes behind —
    * appendBatch refuses with "run ensure()", so ensure must actually
    * see the tear to make that recovery true), and (c) ghost rows in
    * BOTH tables — an index-first ingest that crashed between the
    * rcodes append and the meta write and never replayed leaves codes
    * and rcodes AGREEING with each other while both carry rows meta
    * never counted; those ghosts occupy ADC shortlist slots (the
    * re-rank join drops them, silently displacing real candidates and
    * breaking q69/q65 twin identity). The invariant every healthy
    * state satisfies — build writes exactly meta.n ids, appendBatch
    * bumps meta.n by exactly the ids it appended, meta written last —
    * is `codes distinct ids == rcodes distinct ids == meta.n`; each
    * crash window breaks one equality. Cost: one distinct-count job
    * over the 3-int-column codes tables — small next to the corpus
    * fingerprint scan ensure already pays (which has just validated
    * meta.n against the live corpus, making it the trusted side). */
  private def tablesIntact(spark: SparkSession, dir: String,
      m: AnnIndexMeta): Boolean =
    try {
      // ONE job (tagged union → two distinct counts), not two: the
      // probe runs on every stateless q69/q70 call, and per-job
      // scheduling overhead is what it costs at small scale
      def tableDirExists(t: String): Boolean = {
        val (fs, p) = graft.Scratch.fs(spark, s"$dir/$t")
        fs.exists(p)
      }
      def ids(t: String, tag: Boolean) =
        try withDeltaOf(spark, dir, t)(identity)
          .select(col("vec_id"), lit(tag).as("c"))
        catch {
          case scala.util.control.NonFatal(_)
              if m.n == 0 && tableDirExists(t) =>
            // an n=0 build legitimately writes NO part files under the
            // partitioned dir (nothing to index), which parquet cannot
            // infer a schema from — that is an intact empty table, not
            // damage (without this branch an empty corpus would rebuild
            // on every ensure). Guarded narrowly: the dir must EXIST
            // (a swap crash that deleted it entirely is damage even at
            // n=0 — fall through to the outer catch and rebuild) and
            // the error must be non-fatal. A READABLE table with ghost
            // rows still fails the count-vs-meta.n leg.
            spark.range(0).select(col("id").as("vec_id"), lit(tag).as("c"))
        }
      val r = ids("codes", tag = true)
        .unionByName(ids("rcodes", tag = false))
        .agg(countDistinct(when(col("c"), col("vec_id"))),
          countDistinct(when(!col("c"), col("vec_id"))))
        .head()
      r.getLong(0) == r.getLong(1) && r.getLong(0) == m.n
    } catch { case e: Throwable =>
      System.err.println(s"[annidx] codes tables unreadable at $dir " +
        s"(${e.getMessage}); rebuilding")
      false
    }

  // --- build -----------------------------------------------------------------

  /** Mean residual norm over `rsv` (vec_id, …, sub, sv) — the
    * staleness BASELINE at build time and the batch-side measurement
    * in [[appendBatch]]. Fixed-point sums (the repo-wide float
    * aggregation discipline) so the stored baseline is bit-stable at
    * any parallelism. */
  private def meanResNorm(rsv: DataFrame): Double = {
    import graft.functions.VectorFunctions.dotD
    val perVec = rsv
      .groupBy(col("vec_id"))
      .agg((sum(floor(dotD(col("sv"), col("sv")) * 1e12).cast("long"))
        .cast("double") / 1e12).as("rn2"))
      .select(sqrt(col("rn2")).as("rn"))
    val r = perVec.agg(
      (sum(floor(col("rn") * 1e9).cast("long")).cast("double") / 1e9
        / count(lit(1))).as("m")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Train the full IVF×PQ(+residual) index for `sfDir`'s embeddings
    * into `dir` through a shadow directory + swap. The training calls
    * are LITERALLY q65/q68's build stages — see the object doc.
    * `knownIdentity` forwards (n, fp) when the caller (ensure's
    * rebuild path) has already scanned the corpus — without it every
    * rebuild would pay the identity scan twice back to back. */
  def build(spark: SparkSession, sfDir: String, dir: String,
      knownIdentity: Option[(Long, Long)] = None): BuildInfo =
    graft.sources.WriterLease.withWrite(spark, dir, "build") {
    val t0 = System.nanoTime()
    val raw = Tables.load(spark, sfDir, "embeddings")
    val (n, fp) = knownIdentity.getOrElse(countAndFingerprint(raw))
    val nl = Similarity.nlistFor(n)
    val e = Similarity.prepped(spark, sfDir).filter(Similarity.validNorm)

    // the raw-vector PQ codebook chain is independent of the IVF
    // centroid chain — overlap the two blocking Lloyd sequences on a
    // second driver thread (r18, guide §2.6; identical computations,
    // identical artifacts — q65's trainer does the same)
    val sv = Similarity.subVectors(e)
    val cbookT = Similarity.overlapped(Similarity.pqCodebook(sv))
    // r19: home-cell argmax with the vector riding as payload
    // (Similarity.homeCellsWithVec) — one aggregate serves BOTH
    // downstream consumers (cell-carrying codes, residual derivation),
    // where the old shape ran the homeCells aggregate once per
    // consumer (home was never materialized) and then paid an N⋈N
    // e⋈home join for the residuals plus a codes⋈home join for the
    // codes. Materialized because two branches consume it. guarded:
    // an IVF-chain failure cancels the codebook chain (ADVICE r18).
    val (cents, eh) = cbookT.guarded {
      val c = Similarity.kmeansCentroids(e, nl)
      (c, graft.Materialize(Similarity.homeCellsWithVec(e, c)))
    }
    val cbook = cbookT()
    val codes = Similarity.pqAssign(Similarity.subVectorsWithCell(eh),
        cbook)
      .select(col("vec_id"), col("nrm"), col("sub"), col("code"),
        col("cell"))
    val rsv = graft.Materialize(
      Similarity.residualSubVectors(eh, cents))
    // the residual-norm baseline only needs rsv — overlap its two
    // aggregate jobs with the residual codebook's Lloyd chain
    val baselineT = Similarity.overlapped(meanResNorm(rsv))
    // guarded: a residual-codebook failure cancels the baseline jobs
    val (rcbook, rcodes) = baselineT.guarded {
      val rcb = Similarity.pqCodebook(rsv)
      (rcb, Similarity.pqAssign(rsv, rcb)
        .select(col("vec_id"), col("cell"), col("sub"), col("code")))
    }
    val baseline = baselineT()

    // per-attempt-unique shadow: two builders (different JVMs share no
    // lock) must never interleave their parquet output inside one
    // shadow dir — each writes a complete candidate, last promote
    // wins. Crashed attempts strand their shadow, so sweep stale ones
    // first (quiesced-maintenance contract: nothing else is mid-build
    // here; a swept CONCURRENT builder fails loudly at write/promote,
    // never corrupts the live index).
    val shadow = s"${dir}__shadow_${java.util.UUID.randomUUID().toString.take(8)}"
    val (fs, sp) = graft.Scratch.fs(spark, shadow)
    val stale = fs.globStatus(new org.apache.hadoop.fs.Path(s"${dir}__shadow_*"))
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, true))
    cents.coalesce(1).write.parquet(s"$shadow/centroids")
    cbook.coalesce(1).write.parquet(s"$shadow/codebook")
    rcbook.coalesce(1).write.parquet(s"$shadow/rcodebook")
    // one file per cell partition: the probed-cell read path opens
    // exactly nprobe files per query batch instead of every task's
    // per-cell slivers
    codes.repartition(col("cell")).write.partitionBy("cell")
      .parquet(s"$shadow/codes")
    rcodes.repartition(col("cell")).write.partitionBy("cell")
      .parquet(s"$shadow/rcodes")
    val m = AnnIndexMeta(formatVersion, n, fp, nl, baseline, 0L,
      Similarity.pqSubspaces, Similarity.pqCodes,
      Similarity.lloydIters, Similarity.pqLloydIters,
      app_res_sum = 0.0)
    writeMeta(spark, shadow, m)
    // fence before the swap that makes this candidate the live index
    graft.sources.WriterLease.verify(spark, dir)
    graft.sources.ParquetSink.promote(fs, sp,
      new org.apache.hadoop.fs.Path(dir))
    // a fresh build from the (already-rewritten) corpus makes every
    // tombstone moot — and a surviving sidecar would fold a stale xor
    // into the new meta's expectation, wedging ensure into a rebuild
    // loop (see the deletion section; the promote above deleted the
    // live dir's sidecar already, this clears a racing stamp)
    clearTombstones(spark, dir)
    // the build IS a full validation (artifacts freshly derived from
    // the fingerprinted corpus), so the serving fast path starts warm
    writeToken(spark, dir,
      tokenLine(stateDigest(spark, sfDir, dir), m, 0L, 0L))
    BuildInfo(dir, n, nl, builtNow = true,
      buildSec = (System.nanoTime() - t0) / 1e9)
    }

  /** Serve-ready index dir for `sfDir`: reuse the persisted one when
    * it is current (see [[current]]), build otherwise. In-JVM callers
    * serialize here (Verify dumps queries from several threads; two
    * concurrent builds of the same dir would race the swap).
    *
    * Cost note: a FULL validation is one 2-column corpus scan (vec_id
    * + embedding feed the fingerprint) plus the [[tablesIntact]] probe
    * (one distinct-count job over the int-column codes tables) — the
    * price of NEVER serving a stale OR structurally damaged index
    * without any session state. The persisted validation token
    * ([[stateDigest]]) short-circuits exactly those two Spark jobs on
    * the unchanged path: a full validation (or a build, which is one)
    * stamps the digest of the corpus's and index dir's file listings,
    * and a later stateless call whose CURRENT listings still match
    * serves after only driver-side metadata work — the in-memory
    * checks (dials, format, nlist geometry, the rebuild policy) still
    * run every call. ANY observable change — corpus append, doctored
    * meta, appendBatch sliver, compaction, torn write — changes the
    * listings and falls back to the full scan + probe, which
    * re-stamps the token on success; the doctored-state rebuild
    * guarantees are therefore unchanged. q69/q70 (stateless driver
    * contract) ride this token; a session-holding caller can still
    * keep the returned `info` and skip ensure entirely between
    * ingests.
    *
    * `policy`: beyond freshness, a [[RebuildPolicy]] also rebuilds a
    * CURRENT index whose accumulated append drift or append fraction
    * crossed the policy's thresholds — the deployment form of
    * [[AppendStats.retrainAdvised]] (advice a stateless caller might
    * never act on becomes a guarantee). The rebuild resets both
    * counters, so one violation = one rebuild. Its
    * `compactAtFilesPerCell` axis triggers in-place small-file
    * compaction (never a rebuild) when append slivers pile up — see
    * [[RebuildPolicy]]. */
  def ensure(spark: SparkSession, sfDir: String,
      policy: Option[RebuildPolicy] = None): BuildInfo = {
    val info = ensureSync(spark, sfDir, policy)
    // layout-policy compaction AFTER the monitor releases, so the
    // compaction path takes lease → monitor like every other public
    // mutator (compactAnnIndex's own order). Running it inside
    // serve() under the monitor inverted that order against a
    // concurrent direct compactAnnIndex (lease held, blocked on the
    // monitor) — a bounded ABBA stall that threw LeaseHeldException
    // out of a SERVE path after waitMs. Content-preserving either
    // way, so info (computed pre-compaction) stays valid: effective
    // n, nl and the dir don't move.
    if (!info.builtNow) compactIfPolicied(spark, sfDir, info.dir, policy)
    info
  }

  /** PER-STORE in-JVM monitor (VERDICT r17 #1): the store-level
    * serve/mutate serialization that used to ride the ONE IndexStore
    * object monitor now rides a monitor keyed by the store dir, so
    * two threads of one JVM maintaining DIFFERENT stores (the sharded
    * ingest's K shard bodies, the streaming sinks' several stores) no
    * longer serialize each other — the cross-JVM arbiter was always
    * the per-store [[graft.sources.WriterLease]]; this aligns the
    * in-JVM one with it. Same-store callers keep exactly the old
    * mutual exclusion (one canonical monitor object per dir string,
    * trailing-slash-normalized — all callers obtain dirs from
    * [[dirFor]]/listsDir, so the strings agree). The OBJECT monitor
    * (`IndexStore.synchronized`) remains in use as a deliberate
    * GLOBAL mutex for scratch-pipeline seeding (q78/q79–q82), which
    * is cross-store by nature. */
  private[graft] def monitorFor(dir: String): Object =
    storeMonitors.computeIfAbsent(dir.stripSuffix("/"),
      _ => new Object)

  private val storeMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def ensureSync(spark: SparkSession, sfDir: String,
      policy: Option[RebuildPolicy]): BuildInfo = {
    val dir0 = dirFor(spark, sfDir)
    monitorFor(dir0).synchronized {
      val dir = dir0
      def cheapOk(m: AnnIndexMeta, tombN: Long): Boolean =
        dialsMatch(m) && m.nl == Similarity.nlistFor(m.n - tombN) &&
          !policy.exists(policyViolated(m, _))
      // served size is the EFFECTIVE corpus (meta minus pending valid
      // tombstones) — shortlist sizing and the n=0 delegate then match
      // what a rebuilt-on-survivors index would report
      def serve(m: AnnIndexMeta, tombN: Long): BuildInfo =
        BuildInfo(dir, m.n - tombN, m.nl, builtNow = false, buildSec = 0.0)
      val digest = stateDigest(spark, sfDir, dir)
      readToken(spark, dir) match {
        // fast path: nothing on disk moved since the full validation
        // that stamped the token — zero Spark jobs, only the in-memory
        // checks (on the token's meta + tombstone-fold copy, which the
        // digest vouches for byte-for-byte with the on-disk state)
        case Some((d, tm, tombN, _)) if d == digest && cheapOk(tm, tombN) =>
          serve(tm, tombN)
        case _ =>
          readMeta(spark, dir) match {
            case Some(m) =>
              // deletion heal FIRST (see the deletion section): a
              // crashed deleteBatch left tombstones whose ids are
              // still in the corpus — complete its rewrite before any
              // validation or rebuild reads the corpus (the only
              // direction that can never resurrect deleted rows)
              val (tombRows, tombN, tombXor) = tombAggregates(spark, dir)
              if (tombRows > 0) {
                val tids = tombstoneFrame(spark, dir).get
                  .select(col("vec_id")).distinct()
                val stillIn = Tables.load(spark, sfDir, "embeddings")
                  .join(tids.hint("broadcast"), Seq("vec_id"), "left_semi")
                if (!stillIn.isEmpty) {
                  System.err.println(s"[annidx] completing a crashed " +
                    s"delete's corpus rewrite at $sfDir")
                  // the heal MUTATES the CORPUS — take the corpus-dir
                  // writer lease for just this rewrite (the same lease
                  // the streaming sinks hold around their corpus
                  // appends, so a rewrite can never swap away a file
                  // an in-flight append just landed). Contention note:
                  // this rare path (crashed delete) can wait out the
                  // bounded window inside the store monitor and fail
                  // LOUDLY to a reader — acceptable for a state that
                  // only a crashed writer leaves behind; the retry
                  // heals. The pending probe re-runs INSIDE the lease:
                  // the wait may have outlasted the crashed delete's
                  // replay, and the O(corpus) rewrite must not run as
                  // a token-churning no-op.
                  graft.sources.WriterLease.withWrite(spark, sfDir,
                      "delete-heal") {
                    if (!Tables.load(spark, sfDir, "embeddings")
                        .join(tids.hint("broadcast"), Seq("vec_id"),
                          "left_semi").isEmpty)
                      rewriteTableMinus(spark,
                        s"$sfDir/embeddings.parquet", tids, "vec_id")
                  }
                }
              }
              val (n, fp) =
                countAndFingerprint(Tables.load(spark, sfDir, "embeddings"))
              if (cheapOk(m, tombN) && current(m, n, fp, tombN, tombXor) &&
                  tablesIntact(spark, dir, m)) {
                // validation scans only READ — but the deletion heal
                // above may have rewritten the corpus, so re-digest
                // when tombstones are present (rare path; the digest
                // is driver-side listing work)
                val d2 = if (tombRows > 0) stateDigest(spark, sfDir, dir)
                  else digest
                writeToken(spark, dir, tokenLine(d2, m, tombN, tombXor))
                serve(m, tombN)
              } else build(spark, sfDir, dir, knownIdentity = Some((n, fp)))
            case None => build(spark, sfDir, dir)
          }
      }
    }
  }

  /** [[RebuildPolicy.compactAtFilesPerCell]] + [[RebuildPolicy
    * .foldAtTombstones]] enforcement: glob the two codes tables'
    * `cell=` dirs / probe the tombstone sidecar (driver-side metadata
    * + one small-table agg) and run [[graft.sources.Maintenance
    * .compactAnnIndex]] at a threshold, then re-stamp the token (the
    * rewrite is content-preserving — only layout moves and tombstones
    * fold — and the index was JUST validated by the caller).
    *
    * Called OUTSIDE the store monitor: the compaction takes lease →
    * monitor (compactAnnIndex's own order, re-entered per thread), so
    * this never inverts against a concurrent direct compactAnnIndex.
    * The trigger is probed twice — once unguarded (cheap, skips the
    * lease entirely on the quiet path) and again INSIDE the lease
    * (a racing policied ensure may have just compacted; the rewrite
    * must not run twice). */
  private def compactIfPolicied(spark: SparkSession, sfDir: String,
      dir: String, policy: Option[RebuildPolicy]): Unit = {
    // LOCK-ORDER GUARD (ADVICE r16): this path takes lease → monitor.
    // A caller that wraps a POLICIED ensure() in IndexStore
    // .synchronized would enter here monitor-first and re-create the
    // ABBA stall the post-monitor call site exists to avoid (a
    // concurrent compactAnnIndex holds the lease and blocks on the
    // monitor). No current monitor-holding caller passes a policy;
    // refuse loudly if one ever does rather than deadlock-by-timeout.
    require(policy.isEmpty || (!Thread.holdsLock(IndexStore) &&
        !Thread.holdsLock(monitorFor(dir))),
      "policied ensure()/compactIfPolicied must not be called while " +
        "holding the IndexStore monitor (global or this store's) — " +
        "lease-then-monitor is the required order (see compactAnnIndex)")
    policy.filter(p => p.compactAtFilesPerCell < Int.MaxValue ||
        p.foldAtTombstones < Long.MaxValue).foreach { p =>
      def triggered(): (Boolean, Long) = {
        val worst =
          if (p.compactAtFilesPerCell == Int.MaxValue) Nil
          else Seq("codes", "rcodes").flatMap { t =>
            // current generation only — retired copies are not layout
            val cur = graft.sources.Generations.resolve(spark, s"$dir/$t")
            val (fs, _) = graft.Scratch.fs(spark, cur)
            val st = fs.globStatus(
              new org.apache.hadoop.fs.Path(s"$cur/cell=*/*.parquet"))
            // the delta buffer counts against the same threshold:
            // every reader scans ALL delta files unpruned, so an
            // unbounded delta is the new form of the sliver problem
            // the policy exists for
            val deltaN = deltaFileNames(spark, dir, t).size
            (if (st == null) Nil
             else st.groupBy(_.getPath.getParent).values.map(_.length)) ++
              (if (deltaN > 0) Seq(deltaN) else Nil)
          }
        // tombstone-cadence axis: exists() probe first, so the common
        // tombstone-free store never runs the sidecar agg
        val pendingTombs =
          if (p.foldAtTombstones == Long.MaxValue) 0L
          else if (tombstoneFrame(spark, dir).isEmpty) 0L
          else tombAggregates(spark, dir)._2
        ((worst.nonEmpty && worst.max >= p.compactAtFilesPerCell) ||
          pendingTombs >= p.foldAtTombstones, pendingTombs)
      }
      if (triggered()._1)
        graft.sources.WriterLease.withWrite(spark, dir, "policy-compact") {
          val (go, pendingTombs) = triggered()
          if (go) {
            val (before, after) =
              graft.sources.Maintenance.compactAnnIndex(spark, dir)
            System.err.println(s"[annidx] policy compaction at $dir: " +
              s"$before part files -> $after" +
              (if (pendingTombs >= p.foldAtTombstones)
                s" (folded $pendingTombs pending tombstones)" else ""))
            // the compaction may have FOLDED tombstones (meta
            // changed) — re-read meta and the (now empty) sidecar
            // for the restamp rather than vouching for stale copies
            readMeta(spark, dir).foreach { m2 =>
              val (_, tombN2, tombXor2) = tombAggregates(spark, dir)
              writeToken(spark, dir,
                tokenLine(stateDigest(spark, sfDir, dir), m2, tombN2,
                  tombXor2))
            }
          }
        }
    }
  }

  /** Is there a persisted index at `dir`? The streaming ingest sink
    * uses this to detect a crashed bootstrap (corpus written, build
    * never ran) and re-ensure instead of calling [[appendBatch]] into
    * a void. Existence probe only (driver-side, no Spark job — this
    * runs once per micro-batch): an UNREADABLE meta dir answers true
    * here and then fails [[appendBatch]]'s meta read loudly, which the
    * sink's rebuild-once fallback already converts into one ensure()
    * — the same recovery a false here would have triggered, without
    * paying a per-batch parquet read on the healthy path. */
  def hasIndex(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = graft.Scratch.fs(spark, s"$dir/meta")
    fs.exists(p)
  }

  /** [[BuildInfo]] from the persisted meta ALONE — NO freshness
    * validation and no rebuild, for callers that own freshness
    * themselves (the streaming ingest sinks: they are the only writer
    * of both corpus and index, so the meta row is authoritative
    * between their own appends). A stateless caller must use
    * [[ensure]] instead — meta alone cannot see a changed corpus, and
    * an n that drifted past its built nl would never retrain here
    * (that is [[RebuildPolicy]]'s job on the maintained path). None
    * when no readable index exists. */
  def infoFromMeta(spark: SparkSession, sfDir: String): Option[BuildInfo] = {
    val dir = dirFor(spark, sfDir)
    readMeta(spark, dir).map { m =>
      // pending tombstones fold here exactly as in ensure's serve:
      // info.n is the EFFECTIVE (survivor) size — shortlist sizing and
      // the n==0 delegate branches must agree between the two info
      // sources (driver-side probe + one small-table agg, only when a
      // sidecar exists)
      val (_, tombN, _) = tombAggregates(spark, dir)
      BuildInfo(dir, m.n - tombN, m.nl, builtNow = false, buildSec = 0.0)
    }
  }

  /** Rows added by [[appendBatch]] since the last full build (0 = pure
    * build; None = no readable meta). Verify's twin-identity gate
    * reads this: bit-identity with the in-query twin is promised only
    * for a PURE build — an append-maintained index legitimately serves
    * the pre-append centroids/codebooks (that amortization is the
    * point) and is gated by recall floors instead. */
  def appendedRows(spark: SparkSession, dir: String): Option[Long] =
    try readMeta(spark, dir).map(_.appended_n)
    catch { case scala.util.control.NonFatal(_) => None }

  /** (appended_n, n) from meta. Verify's twin-exemption reads BOTH so
    * it can refuse an implausible self-report: legit state always has
    * 0 ≤ appended_n ≤ n (n counts the appended rows too), so meta
    * claiming more appends than indexed rows is corruption, and the
    * identity gate must not stand down for it. */
  def appendState(spark: SparkSession, dir: String): Option[(Long, Long)] =
    try readMeta(spark, dir).map(m => (m.appended_n, m.n))
    catch { case scala.util.control.NonFatal(_) => None }

  // --- incremental maintenance ----------------------------------------------

  /** Index `batch` (vec_id, embedding, …) into the EXISTING artifacts
    * at `dir`: assign to the trained cells and codebooks (cost ∝
    * batch) and append — no retrain. See the object doc for the
    * idempotence, crash and staleness contracts.
    *
    * RE-KEY CONTRACT: `vec_id` is the key, and a re-sent id must carry
    * the SAME embedding — this is a replay no-op, not an update API.
    * A re-sent id whose changed content keeps its home cell is
    * REFUSED loudly (the stored codes/norm are re-checked against the
    * batch whenever a batch id is already present — see the guard
    * below); one whose content MOVED its home cell is invisible to the
    * cell-pruned membership scan and double-inserts, which the next
    * ensure's integrity probe (distinct ids vs meta.n) detects and
    * heals by rebuild — corrupted serving is bounded by the ensure
    * cadence, never permanent. Both ingest sinks are immune (they
    * anti-join the corpus first, so a known id never reaches
    * appendBatch); direct callers must treat changed-content re-keys
    * as corrupted input.
    *
    * `corpusScreened = true` is the streaming-sink fast path: the
    * caller VOUCHES that (a) every batch id was anti-joined against
    * the index's corpus table before the call, (b) replays re-deliver
    * byte-identical batch content, in order (Structured Streaming's
    * checkpoint contract), and (c) this caller is the only index
    * writer. Under that vouch, one batch-sized identity agg plus a
    * driver-side `_commit` marker compare (exact file listings + a
    * one-deep replay ledger) replace the per-append torn-probe counts
    * and membership scan — the remaining O(index-file-count) terms
    * (INGEST_r14). A batch whose admitted set is NOT replay-
    * deterministic (the screened sink: chains can admit more on
    * replay) must keep the default, measured path. */
  def appendBatch(spark: SparkSession, dir: String,
      batch: DataFrame, corpusScreened: Boolean = false): AppendStats =
    // lease OUTSIDE the monitor: a foreign holder's bounded wait must
    // never block this JVM's readers (ensure/serve ride the monitor).
    // PER-STORE monitor (see monitorFor): appends to different stores
    // — the sharded ingest's K shard bodies — run concurrently
    graft.sources.WriterLease.withWrite(spark, dir,
        "append") { monitorFor(dir).synchronized {
    import graft.functions.VectorFunctions.dotD
    // dev-only phase timer (-Dgraft.prof.append=true): stderr deltas
    val profT = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    def prof(tag: String): Unit =
      if (java.lang.Boolean.getBoolean("graft.prof.append")) {
        val now = System.nanoTime()
        System.err.println(
          f"[appprof] $tag%-8s ${(now - profT.getAndSet(now)) / 1e9}%6.2f")
      } else profT.set(System.nanoTime())
    val m = readMeta(spark, dir).getOrElse(throw new IllegalStateException(
      s"no index at $dir — build() before appendBatch()"))
    // the FULL dial/format guard, not just the version: encoding the
    // batch through pqAssign/subVectors against artifacts built under
    // different dials silently mis-joins (wrong subspace count drops
    // rows; wrong code count mis-scores) — the append would "succeed",
    // report a drift, and be thrown away by the next ensure's rebuild
    require(dialsMatch(m),
      s"index at $dir was built under different dials/format " +
        s"(meta: v${m.version}, sub=${m.subspaces}, codes=${m.pq_codes}, " +
        s"lloyd=${m.lloyd_iters}/${m.pq_lloyd_iters}) — rebuild before " +
        "appending")
    // an n=0 index has NO cells/codebooks — the home-cell join below
    // would silently drop every appended row (nothing written, meta.n
    // bumped anyway). Refuse loudly; the streaming sink's
    // rebuild-once-and-retry fallback turns this into one ensure()
    // against the by-then-non-empty corpus.
    require(m.n > 0,
      s"index at $dir was trained on an empty corpus (n=0) and has no " +
        "cells to assign into — run ensure() once the corpus has rows")
    // DELETION CONTRACT (see the deletion section): a tombstoned id
    // must not re-enter before compaction folds its ghost codes rows —
    // appending would double-key the id and the serve-side anti-join
    // would then hide BOTH copies. Driver-side existence probe on the
    // healthy (no-pending-deletes) path; one batch-sized semi-join
    // when tombstones exist.
    tombstoneFrame(spark, dir).foreach { t =>
      val hit = batch.select(col("vec_id"))
        .join(t.select(col("vec_id")).hint("broadcast"),
          Seq("vec_id"), "left_semi")
        .limit(1).count()
      if (hit > 0) throw new TombstonedReAddException(
        s"batch re-adds tombstoned (deleted) vec_id(s) at $dir — " +
          "re-adding a deleted id is legal only after a compaction " +
          "folds its tombstone (Maintenance.compactAnnIndex)")
    }
    val v = col("embedding").cast("array<double>")
    val pe0 = batch
      .select(col("vec_id"), col("embedding"), v.as("v"),
        sqrt(dotD(v, v)).as("nrm"))
      .filter(Similarity.validNorm)
    // Home cells FIRST (cost ∝ batch): the trained centroids never
    // change on an append, so a replayed row maps to the SAME cell —
    // which is what licenses the cell-pruned membership scan below.
    val cents = spark.read.parquet(s"$dir/centroids")
    val home0 = Similarity.homeCells(
      pe0.select(col("vec_id"), col("v"), col("nrm")), cents)
    // Membership, and TORN-state detection. Codes are written before
    // rcodes, so after any crash:
    //   fresh = not in codes            → full append (codes + rcodes)
    //   torn  = in codes, not in rcodes → a prior append crashed
    //           between the two writes; q69 serves these vectors while
    //           q70 silently skips them. Re-derive and append ONLY
    //           their rcodes rows here (repair), and count them into
    //           meta — the crash happened before the meta write, so
    //           they were never fingerprinted.
    // HEALTHY-PATH SHORTCUT: rcodes ids ⊆ codes ids always (write
    // order), and both tables carry exactly `subspaces` rows per id —
    // so EQUAL plain row counts prove "no torn ids anywhere" from two
    // column-less scans (footer-driven, no shuffle), and the
    // membership anti-join can then prune its codes read to the
    // batch's own home-cell partitions. The old shape paid TWO global
    // distinct-id shuffles per batch — an O(index) term that grew the
    // measured per-batch exponent to 0.2 over the 2k→32k decade
    // (INGEST_r13c.json) for what is almost always a no-op probe.
    // Count inequality falls back to the full detection + repair, as
    // does a codes count that disagrees with meta.n (pre-existing
    // inconsistency — never compound it through the pruned path).
    // (Re-sent ids: see the RE-KEY CONTRACT in the scaladoc and the
    // matched-id verify guard below.)
    prof("entry")
    // MEASURED DETECTION (the pre-marker path, and every fallback):
    // torn-probe counts, membership scan, per-class union + one agg.
    def legacyDetect(): (DataFrame, Long, Long, Long, Long, Long, Long) = {
      val codesCnt = withDeltaOf(spark, dir, "codes")(identity).count()
      val rcodesCnt = withDeltaOf(spark, dir, "rcodes")(identity).count()
      prof("counts")
      val (tornIds, knownIds) =
        if (codesCnt == rcodesCnt &&
            codesCnt == m.n * Similarity.pqSubspaces) {
          val touched = withDeltaOf(spark, dir, "codes")(
            _.filter(col("sub") === 0)
              .join(home0.select(col("cell")).distinct().hint("broadcast"),
                Seq("cell"), "left_semi"))
            .select(col("vec_id"))
          (pe0.select(col("vec_id")).limit(0), touched)
        } else {
          val codesIds = withDeltaOf(spark, dir, "codes")(identity)
            .select(col("vec_id")).distinct()
          val rcodesIds = withDeltaOf(spark, dir, "rcodes")(identity)
            .select(col("vec_id")).distinct()
          val torn = graft.Materialize(
            codesIds.join(rcodesIds, Seq("vec_id"), "left_anti"))
          // a torn id OUTSIDE this batch cannot be repaired here (no
          // embedding to re-encode) — fail loudly so the caller
          // re-ensures instead of continuing to serve degraded q70
          // results. ensure's tablesIntact probe sees exactly this
          // state (distinct id counts differ between codes and
          // rcodes), so "run ensure()" genuinely rebuilds — even when
          // the torn rows reached neither the corpus nor meta and the
          // fingerprint alone would validate.
          val unrepairable =
            torn.join(pe0.select("vec_id"), Seq("vec_id"), "left_anti")
          if (!unrepairable.isEmpty)
            throw new IllegalStateException(
              s"index at $dir is torn (codes rows without rcodes rows, " +
                "for vec_ids outside this batch — a prior append " +
                "crashed between the two writes) and this batch cannot " +
                "repair it; run ensure() to rebuild before appending")
          (torn, codesIds)
        }
      val freshPe = pe0.join(knownIds, Seq("vec_id"), "left_anti")
      val tornPe = pe0.join(tornIds, Seq("vec_id"), "left_semi")
      // matched = already-indexed batch ids (replay no-ops under the
      // re-key contract). They ride the SAME materialized union so the
      // guard below costs zero extra jobs when there are none — but
      // they are EXCLUDED from the fingerprint and the data writes
      // (their hash is already in meta.fp; re-xoring would cancel it
      // out).
      val matchedPe = pe0.join(knownIds, Seq("vec_id"), "left_semi")
        .join(tornIds, Seq("vec_id"), "left_anti")
      val peU = graft.Materialize(
        freshPe.withColumn("cls", lit("f"))
          .unionByName(tornPe.withColumn("cls", lit("t")))
          .unionByName(matchedPe.withColumn("cls", lit("m"))))
      val fpRow = peU
        .agg(count(when(col("cls") === "f", lit(1))),
          count(when(col("cls") =!= "m", lit(1))),
          countDistinct(col("vec_id")), count(lit(1)),
          expr("bit_xor(case when cls != 'm' " +
            "then xxhash64(vec_id, embedding) end)"),
          count(when(col("cls") === "m", lit(1))),
          expr("bit_xor(xxhash64(vec_id, embedding))"))
        .head()
      prof("peagg")
      // duplicate vec_ids WITHIN one batch would double-insert codes
      // rows (16 instead of 8 per vector — the ADC sum then
      // double-counts that vector's subspaces and corrupts the
      // shortlist ordering). vec_id is the key; refuse loudly like
      // every keyed sink here does.
      require(fpRow.getLong(2) == fpRow.getLong(3),
        s"batch contains duplicate vec_id rows " +
          s"(${fpRow.getLong(3) - fpRow.getLong(2)} extras) — " +
          "deduplicate on vec_id before appendBatch")
      (peU, fpRow.getLong(0), fpRow.getLong(1), fpRow.getLong(5),
        if (fpRow.isNullAt(4)) 0L else fpRow.getLong(4),
        fpRow.getLong(3),
        if (fpRow.isNullAt(6)) 0L else fpRow.getLong(6))
    }
    // VOUCHED FAST PATH (corpusScreened=true, see the param doc): one
    // batch-sized identity agg + driver-side marker compare replace
    // the torn-probe counts AND the membership scan — the remaining
    // O(index-file-count) per-append terms. Any marker divergence
    // falls back to the measured path, which re-stamps.
    val vouched: Option[(Long, Long)] =
      if (!corpusScreened) None
      else {
        val idRow = pe0
          .agg(count(lit(1)), countDistinct(col("vec_id")),
            expr("bit_xor(xxhash64(vec_id, embedding))"))
          .head()
        val bn = idRow.getLong(0)
        if (bn == 0) return AppendStats(0L, 0L, None)
        require(idRow.getLong(1) == bn,
          s"batch contains duplicate vec_id rows " +
            s"(${bn - idRow.getLong(1)} extras) — deduplicate on " +
            "vec_id before appendBatch")
        val bfp = idRow.getLong(2)
        readCommit(spark, dir) match {
          case Some(c) if c.lastN == bn && c.lastFp == bfp =>
            // one-deep replay ledger hit: this exact batch already
            // committed (in-order replay re-delivers only the LAST
            // uncommitted batch, so one slot is enough) — its rows are
            // in the index whatever happened since; pure no-op
            return AppendStats(0L, 0L, None)
          case Some(c) if c.n == m.n &&
              annListing(spark, dir, "codes") == c.codes &&
              annListing(spark, dir, "rcodes") == c.rcodes =>
            // the index is byte-for-byte as the last committed append
            // left it (no torn debris anywhere), and the caller
            // vouches no batch id is already indexed ⇒ every valid
            // row is fresh
            Some((bn, bfp))
          case _ => None
        }
      }
    val (pe, freshN, allN, matchedN, allFp, batchN, batchFp) =
      vouched match {
        case Some((bn, bfp)) =>
          prof("counts")
          val peF = graft.Materialize(pe0.withColumn("cls", lit("f")))
          prof("peagg")
          (peF, bn, bn, 0L, bfp, bn, bfp)
        case None => legacyDetect()
      }
    // RE-KEY GUARD (see scaladoc): a matched id claims to be a replay —
    // verify it against the stored rows in its current home cell (one
    // cell-pruned join; codes and norms are deterministic functions of
    // the content, so a true replay matches bit-for-bit, a changed
    // embedding that kept its cell mismatches on codes, and one that
    // MOVED cells finds no stored partner at all — all three non-replay
    // shapes are refused here instead of being silently dropped).
    if (matchedN > 0) {
      val mEnc = Similarity.pqAssign(
        Similarity.subVectors(pe.filter(col("cls") === "m")
          .select(col("vec_id"), col("v"), col("nrm"))),
        spark.read.parquet(s"$dir/codebook"))
        .select(col("vec_id"), col("nrm"), col("sub"), col("code"))
      val stored = withDeltaOf(spark, dir, "codes")(
        _.join(home0.select(col("cell")).distinct().hint("broadcast"),
          Seq("cell"), "left_semi"))
        .select(col("vec_id"), col("sub"),
          col("code").as("stored_code"), col("nrm").as("stored_nrm"))
      // LEFT join, and a NULL stored partner is itself a refusal: a
      // matched id (it IS in the index — that's what matched means)
      // whose changed content moved its home cell joins zero rows in
      // the cell-pruned stored leg. Without the null check that id
      // would silently pass the guard; with it, "moved cell" and
      // "same cell, changed codes" both refuse loudly, and the pruned
      // (batch-cells-only) scan is preserved.
      val bad = mEnc.join(stored, Seq("vec_id", "sub"), "left")
        .filter(col("stored_code").isNull ||
          col("code") =!= col("stored_code") ||
          col("nrm") =!= col("stored_nrm"))
        .select(col("vec_id")).limit(1).count()
      if (bad > 0) throw new IllegalStateException(
        s"batch re-sends already-indexed vec_id(s) with CHANGED " +
          "embedding content — vec_id is the key and appendBatch is " +
          "not an update API (re-key contract); rebuild via ensure() " +
          "after correcting the corpus instead")
    }
    prof("guard")
    def stampCommit(newN: Long): Unit =
      writeCommit(spark, dir, AnnCommit(newN, batchN, batchFp,
        annListing(spark, dir, "codes"), annListing(spark, dir, "rcodes")))
    if (allN == 0) {
      // pure replay (every row matched): nothing written, but re-stamp
      // the marker so the NEXT vouched call recognizes the state (this
      // is the heal for a crash between a completed append's meta
      // write and its marker stamp)
      stampCommit(m.n)
      return AppendStats(0L, 0L, None)
    }
    val tornN = allN - freshN

    val e = pe.filter(col("cls") =!= "m")
      .select(col("vec_id"), col("v"), col("nrm"))
    // home0 covers pe0 ⊇ pe and homeCells is deterministic — restrict
    // rather than recompute
    val home = home0.join(e.select(col("vec_id")), Seq("vec_id"),
      "left_semi")
    // fence before the first VISIBLE write (delta files are read by
    // every withDeltaOf serve path) — a fenced append aborts here
    // having written nothing at all
    graft.sources.WriterLease.verify(spark, dir)
    if (freshN > 0) {
      val eFresh = pe.filter(col("cls") === "f")
        .select(col("vec_id"), col("v"), col("nrm"))
      val codes = Similarity
        .pqAssign(Similarity.subVectors(eFresh),
          spark.read.parquet(s"$dir/codebook"))
        .select(col("vec_id"), col("nrm"), col("sub"), col("code"))
        .join(home, Seq("vec_id"))
      // ONE delta file, not one file per touched cell= dir — the √N
      // per-append commit cost this buffer exists to remove; the fold
      // (compactAnnIndex) restores the cell layout on its cadence
      codes.repartition(1).write
        .mode(SaveMode.Append).parquet(deltaDirOf(dir, "codes"))
    }
    prof("codes")
    // rcodes carry fresh AND repaired rows (torn ids are already in
    // codes — re-deriving their cell/rcodes from the same centroids is
    // deterministic, so the repair matches what the crashed append
    // would have written)
    // batch-sized e⋈home attachment (residualSubVectors now takes the
    // fused frame; this path's home is the RESTRICTED home0, so the
    // join stays — it is batch-sized, not corpus-sized)
    val rsv = graft.Materialize(
      Similarity.residualSubVectors(e.join(home, Seq("vec_id")), cents))
    val rcodes = Similarity
      .pqAssign(rsv, spark.read.parquet(s"$dir/rcodebook"))
      .select(col("vec_id"), col("cell"), col("sub"), col("code"))
    prof("rsv")
    val batchRes = meanResNorm(rsv)
    prof("resnorm")

    rcodes.repartition(1).write
      .mode(SaveMode.Append).parquet(deltaDirOf(dir, "rcodes"))
    prof("rcodes")
    writeMeta(spark, dir, m.copy(n = m.n + allN, fp = m.fp ^ allFp,
      appended_n = m.appended_n + allN,
      app_res_sum = m.app_res_sum + batchRes * allN))
    // marker LAST (meta before marker): a crash here costs one
    // fallback-path append, never a wrong vouch
    stampCommit(m.n + allN)
    AppendStats(freshN, tornN,
      if (m.res_norm > 0) Some(batchRes / m.res_norm) else None)
  } }

  // --- query-only paths ------------------------------------------------------

  /** Query batch (vec_id < knnQueries) as (vec_id, v, nrm) — the only
    * corpus rows the query paths read outside the final re-rank. */
  private def queryVecs(spark: SparkSession, sfDir: String,
      maxQuery: Long = Similarity.knnQueries): DataFrame =
    Similarity.prepped(spark, sfDir)
      .filter(Similarity.validNorm && col("vec_id") < maxQuery)

  /** Disk partition columns come back as the inferred partition type;
    * pin `cell` to its written long so downstream joins/broadcasts see
    * the build-time schema. Generation-resolved: a compacted/folded
    * codes table serves its newest committed generation while retired
    * ones idle out their TTL (see [[graft.sources.Generations]]). */
  private[operators] def readCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(graft.sources.Generations.resolve(spark, path))
      .withColumn("cell", col("cell").cast("long"))

  // --- delta buffer (LSM L0 for the codes tables) ---------------------------
  //
  // appendBatch lands each batch's rows as ONE un-partitioned file per
  // table under `<table>_delta/` (cell rides as a DATA column), so the
  // per-append commit cost is O(1) files instead of one file per
  // touched `cell=` dir (~nlist ∝ √N — the measured per-batch residual
  // of INGEST_r13c/d). Every reader serves base ∪ delta through
  // [[withDeltaOf]]; the delta leg is small (bounded by the fold
  // cadence) and the base leg keeps its DPP-pruned plan — when the
  // delta is empty the returned plan is BYTE-IDENTICAL to the pre-delta
  // shape. [[graft.sources.Maintenance.compactAnnIndex]] FOLDS the
  // delta into the cell layout during its shadow rewrite, which commits
  // as a new retained GENERATION of the table ([[graft.sources
  // .Generations]] — in-flight scans keep their planned base files).
  // The absorbed delta files get the same reader-snapshot treatment:
  // they are NOT deleted at fold time (a scan that planned splits over
  // base ∪ delta would lose its delta files mid-read) — instead the
  // `_fold` sentinel written INTO the shadow (invisible to parquet — an
  // underscore file) records `name|foldMillis` per absorbed file, every
  // delta read EXCLUDES the sentinel-listed names (reads are
  // explicit-file-list, so retained absorbed files are never served
  // twice), and the physical delete happens once an entry's fold age
  // exceeds the Generations TTL ([[reapAbsorbedDelta]], piggybacked on
  // every delta listing). A crash at any point leaves either the old
  // generation live (sentinel unborn with the shadow — delta still
  // served) or the new one (sentinel in place — delta excluded): never
  // a doubled row, never a file pulled from under a planned scan
  // before the TTL.

  private[graft] def deltaDirOf(dir: String, table: String): String =
    s"$dir/${table}_delta"

  /** The `_fold` sentinel lives INSIDE the current generation of the
    * base table (stamped into the shadow pre-commit), so it commits
    * and retires atomically with the base it describes. */
  private def foldMarker(spark: SparkSession, dir: String,
      table: String): String =
    graft.sources.Generations.resolve(spark, s"$dir/$table") + "/_fold"

  /** Absorbed delta files of the CURRENT base generation:
    * name → foldMillis. Legacy (name-only) sentinel lines date from
    * the sentinel file's own mtime. Empty without a sentinel. */
  private[graft] def absorbedDelta(spark: SparkSession, dir: String,
      table: String): Map[String, Long] = {
    val (fs, mp) = graft.Scratch.fs(spark, foldMarker(spark, dir, table))
    if (!fs.exists(mp)) return Map.empty
    val fileTime =
      try fs.getFileStatus(mp).getModificationTime
      catch { case scala.util.control.NonFatal(_) =>
        System.currentTimeMillis() }
    val lines =
      try new String(graft.Scratch.readSmallFile(fs, mp), "UTF-8")
        .split('\n').map(_.trim).filter(_.nonEmpty)
      catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    lines.map { l =>
      l.split('|') match {
        case Array(n, at) if at.forall(_.isDigit) => (n, at.toLong)
        case _ => (l, fileTime)
      }
    }.toMap
  }

  /** Physically delete absorbed delta files whose fold age exceeds the
    * Generations TTL — no planned scan can still reference them under
    * the TTL contract. Idempotent, driver-side; entries for
    * already-gone files are inert (pruned at the next fold's
    * carry-forward). Called ONLY from lease-holding maintenance paths
    * (gcGenerations / compactAnnIndex via `deltaFileNames(reap=true)`)
    * — never from serve paths, which stay purely exclusion-based: a
    * READER may lack write permission on the store, and a delete from
    * an unfenced path would race the writer lease (ADVICE r17). Each
    * delete is individually NonFatal-guarded: a permission error or a
    * concurrent-reap race on one file must not fail the listing that
    * triggered it — the entry stays for the next maintenance pass. */
  private def reapAbsorbedDelta(spark: SparkSession, dir: String,
      table: String, absorbed: Map[String, Long]): Unit = {
    if (absorbed.isEmpty) return
    val cutoff = System.currentTimeMillis() -
      graft.sources.Generations.ttlMs(spark) -
      graft.sources.Generations.skewMs(spark)
    val dd = deltaDirOf(dir, table)
    absorbed.foreach { case (n, at) =>
      if (at < cutoff) {
        try {
          val (dfs, p) = graft.Scratch.fs(spark, s"$dd/$n")
          if (dfs.exists(p)) dfs.delete(p, false)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] absorbed-delta reap of $dd/$n " +
            s"skipped: ${e.getMessage}")
        }
      }
    }
  }

  /** Stamp the fold sentinel into `shadowTableDir` (pre-commit):
    * `entries` = every delta file whose rows the shadow's base now
    * owns — the files this fold absorbed plus the still-on-disk
    * entries carried forward from the previous generation's sentinel. */
  private[graft] def stampFold(spark: SparkSession,
      shadowTableDir: String, entries: Map[String, Long]): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, s"$shadowTableDir/_fold")
    val out = fs.create(p, true)
    try out.write(entries.toSeq.sorted.map { case (n, at) => s"$n|$at" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Data file names currently SERVED from a table's delta dir:
    * on-disk files minus the current generation's absorbed set (their
    * rows live in the base since the fold; the files stay until the
    * TTL). `reap = true` additionally deletes TTL-expired absorbed
    * files — pass it ONLY from a lease-holding maintenance path
    * (gcGenerations, compactAnnIndex); serve paths (deltaFrame /
    * withDeltaOf / marker probes) keep the default and stay purely
    * exclusion-based, so a read-only client never issues a delete
    * (ADVICE r17: an unguarded serve-path reap gave readers without
    * write permission query FAILURES once an entry aged past TTL,
    * and mutated the store outside any writer lease). */
  private[graft] def deltaFileNames(spark: SparkSession, dir: String,
      table: String, reap: Boolean = false): Seq[String] = {
    val absorbed = absorbedDelta(spark, dir, table)
    if (reap) reapAbsorbedDelta(spark, dir, table, absorbed)
    val (fs, p) = graft.Scratch.fs(spark, deltaDirOf(dir, table))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          !absorbed.contains(n)
      }
      .map(_.getPath.getName)
  }

  /** The delta leg of a codes table, or None when empty — callers
    * union it under their OWN pruning so the base leg's plan (DPP and
    * all) is untouched, and skip the union entirely when there is no
    * delta. EXPLICIT file-list read (never the whole dir): absorbed-
    * but-retained files must not be served twice. */
  private[operators] def deltaFrame(spark: SparkSession, dir: String,
      table: String): Option[DataFrame] = {
    val names = deltaFileNames(spark, dir, table)
    if (names.isEmpty) None
    else {
      val dd = deltaDirOf(dir, table)
      Some(spark.read.parquet(names.sorted.map(n => s"$dd/$n"): _*))
    }
  }

  /** base-leg-through-`prune` ∪ delta-leg-through-`prune` — the one
    * read shape every codes/rcodes consumer uses. */
  private[graft] def withDeltaOf(spark: SparkSession, dir: String,
      table: String)(prune: DataFrame => DataFrame): DataFrame = {
    val base = prune(readCodes(spark, s"$dir/$table"))
    deltaFrame(spark, dir, table) match {
      case None => base
      case Some(d) => base.unionByName(
        prune(d).select(base.columns.map(col).toIndexedSeq: _*))
    }
  }

  // --- deletion lifecycle (tombstones) ---------------------------------------
  //
  // The one operation appends cannot express: REMOVE rows from a
  // served corpus (retention, right-to-be-forgotten) without a full
  // rebuild. Shape mirrors the append-side LSM delta: deletes land in
  // a `tombstones/` sidecar under the index dir ((vec_id, rowfp,
  // valid, cell) — rowfp = xxhash64(vec_id, embedding) captured from
  // the corpus row at delete time, so the corpus fingerprint xor-FOLDS
  // across deletes the same way it xor-composes across appends), and
  // physical removal is deferred to compaction. Invariants:
  //
  //  - [[deleteBatch]] stamps tombstones FIRST, then rewrites the
  //    corpus table minus ALL tombstoned ids (shadow + promote swap).
  //    Serving is delete-correct from the instant the tombstone file
  //    lands (every candidate stream anti-joins the sidecar), so the
  //    crash window between the two writes leaks nothing; [[ensure]]
  //    HEALS that window by completing the corpus rewrite — the only
  //    safe direction (a rebuild before the heal would re-index the
  //    undeleted rows; after it, a rebuild can never resurrect them).
  //  - [[ensure]] validates a tombstoned index against the FOLDED
  //    expectation: corpus count must read meta.n − |valid tombstones|
  //    and corpus fp must read meta.fp XOR xor(valid rowfps) — no
  //    rescan of the deleted rows, no rebuild on the healthy path.
  //    `valid` mirrors [[countAndFingerprint]]'s validNorm filter:
  //    invalid-norm rows were never counted or fingerprinted, so their
  //    deletion must not fold either.
  //  - [[build]] CLEARS the sidecar at promote: a fresh index derives
  //    from the (already rewritten) corpus, so every tombstone is moot
  //    — and leaving them would fold a stale xor into the new meta's
  //    expectation, wedging ensure into a rebuild loop.
  //  - [[graft.sources.Maintenance.compactAnnIndex]] FOLDS: both codes
  //    tables are rewritten minus tombstoned ids, meta.n/fp fold the
  //    sidecar's aggregates, the sidecar is cleared. A crash anywhere
  //    inside converges by ensure-rebuild (count/fp/integrity
  //    mismatch), exactly like the append path's rcodes→meta window —
  //    and never resurrects, because the corpus rewrite already
  //    happened at deleteBatch time.
  //  - [[appendBatch]] REFUSES a batch carrying a tombstoned id: its
  //    ghost codes rows are still in the index until the fold, so a
  //    re-append would double-key the id (and the serve-side anti-join
  //    would then hide BOTH copies). Re-adding a deleted id is legal
  //    AFTER a compaction folds the tombstone.
  //
  // 100 TB note: the tombstone sidecar is bounded by the fold cadence
  // (anti-joins broadcast it); the corpus rewrite is one distributed
  // scan-and-copy per delete batch — on a partitioned production
  // corpus the same swap applies per affected partition. The INDEX
  // side never rewrites outside compaction, which it was paying
  // anyway.

  final case class DeleteStats(tombstoned: Long, removedFromCorpus: Long)

  /** Compaction's closing step (see [[graft.sources.Maintenance
    * .compactAnnIndex]]): after both codes tables were rewritten minus
    * the tombstoned ids, fold the sidecar's aggregates into meta
    * (n/fp) and clear it. Crash windows converge by ensure-rebuild:
    * tables-folded-but-meta-not fails the integrity probe's count leg;
    * meta-folded-but-sidecar-present double-subtracts the expectation
    * and fails the fingerprint leg — and neither can resurrect rows,
    * because the corpus rewrite happened at deleteBatch time. */
  private[graft] def foldTombstonesIntoMeta(spark: SparkSession,
      dir: String): Unit = {
    val (rows, validN, xor) = tombAggregates(spark, dir)
    if (rows == 0) return
    graft.sources.WriterLease.withWrite(spark, dir, "tombfold") {
      val m = readMeta(spark, dir).getOrElse(throw new IllegalStateException(
        s"no readable meta at $dir — cannot fold tombstones"))
      writeMeta(spark, dir, m.copy(n = m.n - validN, fp = m.fp ^ xor))
      clearTombstones(spark, dir)
    }
  }

  private[graft] def tombDirOf(dir: String): String = s"$dir/tombstones"

  /** Tombstone rows (vec_id, rowfp, valid, cell), None when the
    * sidecar is absent or holds no data files (driver-side probe). */
  private[graft] def tombstoneFrame(spark: SparkSession,
      dir: String): Option[DataFrame] = {
    val root = tombDirOf(dir)
    val (fs, p) = graft.Scratch.fs(spark, root)
    if (!fs.exists(p)) return None
    val hasData = fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData) None else Some(spark.read.parquet(root))
  }

  /** (rows, valid rows, xor of valid rowfps) of the sidecar — the
    * fold terms of every tombstone-aware validation. One small-table
    * agg; (0,0,0) without a sidecar (driver-side probe only). */
  private[graft] def tombAggregates(spark: SparkSession,
      dir: String): (Long, Long, Long) =
    tombstoneFrame(spark, dir) match {
      case None => (0L, 0L, 0L)
      case Some(t) =>
        val r = t.agg(count(lit(1)),
          count(when(col("valid"), lit(1))),
          expr("bit_xor(case when valid then rowfp end)")).head()
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
    }

  private[graft] def clearTombstones(spark: SparkSession,
      dir: String): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, tombDirOf(dir))
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Rewrite `table` minus `ids` through a shadow + promote swap —
    * crash-atomic (a crash leaves either the old or the new table
    * complete, never a half-rewrite). Refuses to EMPTY the table: a
    * zero-row parquet write emits no schema-bearing part files and
    * every later read of the corpus would throw — deleting an entire
    * corpus is "remove the table and its index", not a delete batch. */
  private[graft] def rewriteTableMinus(spark: SparkSession, table: String,
      ids: DataFrame, key: String): Long = {
    val survivors = spark.read
      .parquet(graft.sources.Generations.resolve(spark, table))
      .join(ids.select(col(key)).hint("broadcast"), Seq(key), "left_anti")
    require(!survivors.isEmpty,
      s"delete batch would remove EVERY row of $table — deleting a " +
        "whole corpus is table+index removal, not a delete batch")
    // retained-generation commit (VERDICT r16 #1): the previous table
    // copy stays byte-identical at its old paths until the TTL, so a
    // scan that planned its splits before this forget completes
    // correctly; new readers resolve to the survivors
    val shadow = graft.sources.Generations.shadowFor(spark, table)
    survivors.write.parquet(shadow)
    graft.sources.Generations.commit(spark, table, shadow)
    0L
  }

  /** Delete `kills` (a vec_id frame) from the corpus at `sfDir` and
    * its persisted index: stamp tombstones (serving excludes them from
    * that instant), then rewrite the corpus table minus every
    * tombstoned id. Replay-idempotent: already-tombstoned and
    * already-absent ids are skipped, and a replay after any crash
    * point converges to the same state (see the section doc). Physical
    * index removal is [[graft.sources.Maintenance.compactAnnIndex]]'s
    * job; until then ghost codes rows are excluded by every reader. */
  def deleteBatch(spark: SparkSession, sfDir: String,
      kills: DataFrame): DeleteStats = {
    val dir = dirFor(spark, sfDir)
    // lease outside the monitor — same ordering note as appendBatch
    graft.sources.WriterLease.withWrite(spark, dir, "delete") {
    monitorFor(dir).synchronized {
    import graft.functions.VectorFunctions.dotD
    require(readMeta(spark, dir).nonEmpty,
      s"no index at $dir — ensure() before deleteBatch (deletion is " +
        "index maintenance; an index-less corpus is a plain filter)")
    val table = s"$sfDir/embeddings.parquet"
    val raw = Tables.load(spark, sfDir, "embeddings")
    val killIds = kills.select(col("vec_id")).distinct()
    val present = raw.join(killIds.hint("broadcast"),
      Seq("vec_id"), "left_semi")
    val fresh = tombstoneFrame(spark, dir).fold(present)(t =>
      present.join(t.select(col("vec_id")).hint("broadcast"),
        Seq("vec_id"), "left_anti"))
    val v = col("embedding").cast("array<double>")
    val nrm = sqrt(dotD(v, v))
    // home cell from the INDEX's own sub-0 rows (the one definition of
    // home), not recomputed from centroids: compaction prunes its
    // rewrite by these cells, so they must name where the rows
    // actually sit. Invalid-norm rows were never indexed → cell null.
    val homes = withDeltaOf(spark, dir, "codes")(
      _.filter(col("sub") === 0)).select(col("vec_id"), col("cell"))
    val cap = graft.Materialize(fresh
      .select(col("vec_id"),
        xxhash64(col("vec_id"), col("embedding")).as("rowfp"),
        (nrm > 0 && nrm < Double.PositiveInfinity).as("valid"))
      .join(homes, Seq("vec_id"), "left"))
    val freshN = cap.count()
    // fence before the tombstone append — the commit point: serving
    // excludes the ids from the instant these rows land
    graft.sources.WriterLease.verify(spark, dir)
    if (freshN > 0)
      cap.repartition(1).write.mode(SaveMode.Append)
        .parquet(tombDirOf(dir))
    // corpus rewrite: drop EVERY tombstoned id still present — this
    // batch's and any crashed predecessor's (the replay IS the heal)
    val removed = tombstoneFrame(spark, dir) match {
      case None => 0L
      case Some(t) =>
        val tids = t.select(col("vec_id")).distinct()
        val pendingN = raw.join(tids.hint("broadcast"),
          Seq("vec_id"), "left_semi").count()
        if (pendingN > 0) {
          // hold the CORPUS-DIR lease across the rewrite: the
          // streaming sinks take the same lease around their corpus
          // appends, so the swap can never discard a file an
          // in-flight append just landed (hold order index→corpus;
          // the sinks never hold both at once, so no cycle)
          graft.sources.WriterLease.withWrite(spark, sfDir,
              "corpus-rewrite") {
            // RE-verify the index lease and RE-probe the pending set
            // INSIDE the corpus lease: the acquisition may have
            // waited out a takeover (this writer is then stale — the
            // rewrite must not land) or a concurrent delete that
            // already removed the ids (the O(corpus) rewrite would
            // be a pure no-op swap that churns every token)
            graft.sources.WriterLease.verify(spark, dir)
            val stillPending = spark.read
              .parquet(graft.sources.Generations.resolve(spark, table))
              .join(tids.hint("broadcast"), Seq("vec_id"), "left_semi")
              .limit(1).count()
            if (stillPending > 0)
              rewriteTableMinus(spark, table, tids, "vec_id")
          }
        }
        pendingN
    }
    DeleteStats(freshN, removed)
  } } }

  // --- append commit marker (zero-job fast path for screened sinks) ---------
  //
  // The remaining per-append O(index) terms after the delta buffer are
  // the torn-probe row counts (footer scans over ~nlist base files)
  // and the membership scan (one file open per cell dir). Both exist
  // to answer "is the index exactly as the last completed append left
  // it, and which batch ids are already in it" — questions a
  // driver-side marker can answer without any Spark job when the
  // CALLER vouches that its batch was already anti-joined against the
  // corpus (the streaming sinks' discipline). `_commit` under the
  // index dir records meta.n, the last applied batch's identity
  // (count + xor fingerprint — the one-deep replay ledger: in-order
  // checkpoint replay re-delivers only the LAST uncommitted batch),
  // and the exact (file → length) listing of both codes tables
  // (base + delta). Validation is exact-match; ANY divergence (crashed
  // append debris, compaction, foreign writes, a missing marker) falls
  // back to the measured counts + membership path, which re-stamps on
  // success — the marker can never vouch for a state it didn't see
  // committed, same trust class as the ingest IngestCommit marker.

  private[operators] final case class AnnCommit(n: Long, lastN: Long,
      lastFp: Long, codes: Map[String, (Long, Long)],
      rcodes: Map[String, (Long, Long)])

  // v2 adds mtime to the per-file listing entries so the vouched fast
  // path sits in the SAME trust class as stateDigest's name|length|mtime
  // lines — a same-name same-length foreign rewrite of a codes file now
  // forces the measured fallback instead of passing the vouch. A v1
  // marker fails the header check and falls back (safe, re-stamps).
  private val annCommitHeader = "graftanncommit|2"

  private def commitMarkerPath(dir: String) = s"$dir/_commit"

  /** Exact (relative path → (length, mtime)) listing of a codes
    * table's base + delta data files; `_`/`.`-led path segments
    * (committer temp dirs, crc files, the _fold sentinel) are
    * excluded. mtime rides along so the marker's exact-match vouch
    * matches stateDigest's trust class at no extra listing cost (the
    * same FileStatus carries both). Driver-side only. */
  private[operators] def annListing(spark: SparkSession, dir: String,
      table: String): Map[String, (Long, Long)] = {
    def one(root: String): Map[String, (Long, Long)] = {
      val (fs, p) = graft.Scratch.fs(spark, root)
      if (!fs.exists(p)) return Map.empty
      val base = fs.makeQualified(p).toString + "/"
      graft.Scratch.walkFiles(fs, p)
        .map(s => (s.getPath.toString.stripPrefix(base),
          (s.getLen, s.getModificationTime)))
        .filterNot { case (rel, _) =>
          rel.split('/').exists(seg =>
            seg.startsWith("_") || seg.startsWith("."))
        }.toMap
    }
    // base leg generation-resolved (rel paths are gen-relative — a
    // fold commits a new generation and legitimately invalidates the
    // marker once); delta leg restricted to the SERVED file set, so
    // absorbed-but-TTL-retained files neither vouch nor invalidate
    val served = deltaFileNames(spark, dir, table).toSet
    one(graft.sources.Generations.resolve(spark, s"$dir/$table"))
      .map { case (f, l) => (s"$table/$f", l) } ++
      one(deltaDirOf(dir, table)).collect {
        case (f, l) if served.contains(f) => (s"${table}_delta/$f", l)
      }
  }

  private[operators] def readCommit(spark: SparkSession, dir: String)
      : Option[AnnCommit] = {
    val (fs, p) = graft.Scratch.fs(spark, commitMarkerPath(dir))
    if (!fs.exists(p)) return None
    val text =
      try new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
      catch { case scala.util.control.NonFatal(_) => return None }
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty || lines.head != annCommitHeader) return None
    try {
      var n = -1L; var lastN = -1L; var lastFp = 0L
      val codes = Map.newBuilder[String, (Long, Long)]
      val rcodes = Map.newBuilder[String, (Long, Long)]
      lines.tail.foreach { l =>
        l.split('|') match {
          case Array("n", v) => n = v.toLong
          case Array("last", c, f) => lastN = c.toLong; lastFp = f.toLong
          case Array("codes", f, len, mt) =>
            codes += ((f, (len.toLong, mt.toLong)))
          case Array("rcodes", f, len, mt) =>
            rcodes += ((f, (len.toLong, mt.toLong)))
          case _ => return None
        }
      }
      if (n < 0) None
      else Some(AnnCommit(n, lastN, lastFp, codes.result(), rcodes.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[operators] def writeCommit(spark: SparkSession, dir: String,
      c: AnnCommit): Unit = {
    // fence OUTSIDE the try: a StaleWriterException is
    // IllegalStateException (NonFatal) and the swallow-and-log below
    // would otherwise turn a fenced marker write into a "success"
    graft.sources.WriterLease.verify(spark, dir)
    try {
      val (fs, p) = graft.Scratch.fs(spark, commitMarkerPath(dir))
      val body = (Seq(annCommitHeader, s"n|${c.n}",
        s"last|${c.lastN}|${c.lastFp}") ++
        c.codes.toSeq.sorted.map { case (f, (l, m)) => s"codes|$f|$l|$m" } ++
        c.rcodes.toSeq.sorted.map { case (f, (l, m)) => s"rcodes|$f|$l|$m" })
        .mkString("\n")
      val out = fs.create(p, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(e) =>
      // NonFatal, not Throwable: an OOM/VM error during the marker
      // write must propagate, not be logged into a "successful" return
      System.err.println(s"[annidx] commit marker write failed at $dir " +
        s"(${e.getMessage}); next append falls back to the counted path")
    }
  }

  /** IVF×PQ top-k served from a VALIDATED index — the query-many half
    * of the lifecycle a session-holding deployment runs: one
    * [[ensure]] (or [[build]]) buys the `info` handle, then every
    * query against it skips revalidation (no corpus identity scan —
    * the caller owns freshness between ensures, exactly the
    * maintenance discipline [[appendBatch]] supports). Same
    * expressions as [[Similarity.q65KnnIvfPq]], bit-identical
    * results; only the probed cells' code partitions are scanned
    * (plan-asserted DPP). */
  def queryIvfPq(spark: SparkSession, sfDir: String,
      info: BuildInfo, kk: Int = Similarity.k,
      maxQuery: Long = Similarity.knnQueries,
      exclude: Option[DataFrame] = None): DataFrame = {
    // an n=0 index has no persisted part files to serve from (nothing
    // was indexed) — delegate to the in-query twin, which is free at
    // n=0 (no data to train on) and gives twin-identical output BY
    // CONSTRUCTION, including its schema (on an empty corpus every
    // (kk, maxQuery) dial produces the same zero rows; an exclusion
    // set is vacuous against zero candidates)
    if (info.n == 0) return Similarity.q65KnnIvfPq(spark, sfDir)
    val dir = info.dir
    val qe = queryVecs(spark, sfDir, maxQuery)
    val cents = spark.read.parquet(s"$dir/centroids")
    val probes = Similarity.topCells(qe, cents,
        Similarity.nprobeFor(info.nl))
      .select(col("vec_id").as("query_id"), col("cell"))
    // `exclude` (a vec_id frame) is soft-delete serving: excluded ids
    // leave the CANDIDATE stream before the shortlist, so rank-k is
    // computed among the remaining vectors — not truncated after the
    // fact. The anti-join rides the already-pruned probed stream
    // (cost ∝ probed cells, never the index), q78's serving stage.
    val probed0 = withDeltaOf(spark, dir, "codes")(
      _.join(broadcast(probes), Seq("cell")))
    // persisted tombstones are a standing exclusion (deleted ids'
    // ghost codes rows remain until compaction folds them), composed
    // with the caller's soft-delete set under the same anti-join
    val probed = (exclude.toSeq ++
        tombstoneFrame(spark, dir).toSeq)
      .foldLeft(probed0)((d, x) =>
        d.join(x.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val lut = Similarity.pqLut(Similarity.subVectors(qe),
      spark.read.parquet(s"$dir/codebook"))
    val cand = Similarity.adcShortlist(probed, lut,
      Seq("query_id", "sub", "code"), Similarity.shortlistFor(info.n))
    Similarity.rerankTopK(Tables.load(spark, sfDir, "embeddings"), cand,
      kk, maxQuery)
  }

  /** q69: [[Similarity.q65KnnIvfPq]] served from the persisted index —
    * same artifacts, same query expressions, bit-identical result
    * (IndexStoreSpec pins it); the in-query Lloyd training is replaced
    * by three parquet reads. The driver contract is stateless, so each
    * call revalidates via [[ensure]]; [[queryIvfPq]] is the
    * validate-once entry a session-holding caller uses instead. */
  def q69KnnIvfPqIdx(spark: SparkSession, sfDir: String): DataFrame =
    queryIvfPq(spark, sfDir, ensure(spark, sfDir))

  /** Residual IVF×PQ top-k from a VALIDATED index (see [[queryIvfPq]]
    * for the validate-once contract): residual codes + shared residual
    * codebook, exact per-(query, probed-cell) term recovered from
    * [[Similarity.topCells]] exactly as q68 does. */
  def queryIvfPqRes(spark: SparkSession, sfDir: String,
      info: BuildInfo): DataFrame = {
    // see queryIvfPq: n=0 → the twin, free and identical by construction
    if (info.n == 0) return Similarity.q68KnnIvfPqRes(spark, sfDir)
    val dir = info.dir
    val qe = queryVecs(spark, sfDir)
    val cents = spark.read.parquet(s"$dir/centroids")
    val probesCt = Similarity.topCells(qe, cents,
        Similarity.nprobeFor(info.nl))
      .join(broadcast(cents.select(col("cell"), col("cn"))), Seq("cell"))
      .select(col("vec_id").as("query_id"), col("cell"),
        (col("cd") + col("cn")).as("ct"))
    val probed = tombstoneFrame(spark, dir)
      .foldLeft(withDeltaOf(spark, dir, "rcodes")(
        _.join(broadcast(probesCt), Seq("cell"))))((d, t) =>
        d.join(t.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val lut = Similarity.pqLut(Similarity.subVectors(qe),
      spark.read.parquet(s"$dir/rcodebook"))
    val cand = Similarity.adcShortlist(probed, lut,
      Seq("query_id", "sub", "code"), Similarity.shortlistFor(info.n),
      approxScore = max(col("ct")) + Similarity.adcSum)
    Similarity.rerankTopK(Tables.load(spark, sfDir, "embeddings"), cand)
  }

  /** q70: [[Similarity.q68KnnIvfPqRes]] served from the persisted
    * index — bit-identical result (IndexStoreSpec pins it). Stateless
    * driver contract → per-call [[ensure]]; session-holding callers
    * use [[queryIvfPqRes]] with a kept `info`. */
  def q70KnnIvfPqResIdx(spark: SparkSession, sfDir: String): DataFrame =
    queryIvfPqRes(spark, sfDir, ensure(spark, sfDir))

  /** [[queryIvfPq]] with an EXPLICIT query batch — the sharded store's
    * per-shard serve leg ([[Sharded]], VERDICT r17 #1): a hash-sharded
    * corpus holds each query vector in exactly ONE shard, so every
    * OTHER shard must serve queries it does not own. Same expressions
    * as [[queryIvfPq]] (probe ranks → cell-pruned codes scan → ADC
    * shortlist → exact re-rank); the re-rank frame is the shard's own
    * table (query-id rows excluded) plus the caller's query rows, so
    * no id appears twice and the returned cosines are exact.
    * `queries` = (vec_id, embedding) with every vec_id < `maxQuery`;
    * `maxQuery` must not exceed [[Similarity.knnQueries]] (pqLut's
    * internal query filter). */
  private[operators] def queryIvfPqFrom(spark: SparkSession,
      shardDir: String, info: BuildInfo, queries: DataFrame,
      kk: Int = Similarity.k,
      maxQuery: Long = Similarity.knnQueries): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    require(maxQuery <= Similarity.knnQueries,
      "queryIvfPqFrom: maxQuery beyond the shared pqLut query filter")
    val qRaw = queries.filter(col("vec_id") < maxQuery)
      .select(col("vec_id"), col("embedding"))
    if (info.n == 0)
      // an empty shard contributes nothing — the merge's unit element,
      // schema-identical to the served shape
      return qRaw.limit(0).select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0).cast("int").as("rank"))
    val dir = info.dir
    val v = col("embedding").cast("array<double>")
    val qe = qRaw
      .select(col("vec_id"), v.as("v"), sqrt(dotD(v, v)).as("nrm"))
      .filter(Similarity.validNorm)
    val cents = spark.read.parquet(s"$dir/centroids")
    val probes = Similarity.topCells(qe, cents,
        Similarity.nprobeFor(info.nl))
      .select(col("vec_id").as("query_id"), col("cell"))
    val probed0 = withDeltaOf(spark, dir, "codes")(
      _.join(broadcast(probes), Seq("cell")))
    val probed = tombstoneFrame(spark, dir).toSeq
      .foldLeft(probed0)((d, t) =>
        d.join(t.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val lut = Similarity.pqLut(Similarity.subVectors(qe),
      spark.read.parquet(s"$dir/codebook"))
    val cand = Similarity.adcShortlist(probed, lut,
      Seq("query_id", "sub", "code"), Similarity.shortlistFor(info.n))
    val e = Tables.load(spark, shardDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= maxQuery)
      .unionByName(qRaw)
    Similarity.rerankTopK(e, cand, kk, maxQuery)
  }

  /** SemDeDup-style embedding near-duplicate dedup served from the
    * PERSISTED IVF index — the scale path next to
    * [[Similarity.q45EmbedDedup]]'s exact all-pairs screen (documented
    * inherent O(N²)). Same keeper rule: drop every vector with SOME
    * lower-id partner at cosine ≥ [[Similarity.pairThreshold]];
    * survivors are the full table minus dropped (zero/NaN-norm vectors
    * are never indexed, never paired, and therefore always survive —
    * q45's rule exactly).
    *
    * Two stages, every join an equality join:
    *  1. PROBE: every corpus vector ranks the broadcast centroid table
    *     ([[Similarity.topCells]] — the serving rule) and probes its
    *     [[Similarity.nprobeFor]] cells. Candidate pairs are (probing
    *     vector, indexed vector) sharing a probed cell, normalized to
    *     (id_a < id_b) and distinct'ed — a pair is caught when EITHER
    *     side probes the other's home cell, so the per-pair miss
    *     probability is the one-directional miss SQUARED (measured
    *     pair recall 0.96 at the 2000-vector gate corpus vs ~0.75
    *     one-directional).
    *  2. VERIFY: exact cosine evaluated INSIDE the cell join (vectors
    *     ride into it; codegen'd double dot product; only verified
    *     hits leave as bare dropped ids — see the in-body comment for
    *     why no pair stream is ever shuffled). A pair drops its higher
    *     id only when the EXACT cosine clears the threshold — the
    *     probe stage can only MISS pairs, never fabricate them, so the
    *     survivor set is always a SUPERSET of q45's (one-sided error;
    *     Verify gates the miss rate, IndexStoreSpec pins the superset
    *     property).
    *
    * There is deliberately NO code-based (PQ) pre-screen between the
    * stages, though the index ships one: measured on this fixture's
    * true ≥0.42 pairs, the SDC reconstruction-cosine reads the exact
    * cosine with bias −0.19 and std 0.14 (residual codes −0.22/0.14 —
    * the error is the near-uniform data's entropy, not the encoding),
    * so an absolute-margin screen wide enough to keep the true pairs
    * admits essentially the whole stream, and a rank screen tight
    * enough to prune costs recall (top-128: 0.73 dropped-id recall vs
    * the 0.96 probe ceiling). The screen's shuffle volume (8 code rows
    * per pair) also rivals the verify's one wide row per pair — it
    * bought nothing on any axis here. On corpora whose duplicates sit
    * at cosine ≥ 0.9 (real near-dup corpora — quantization noise ≪
    * the dup-vs-background gap there) a margin screen becomes viable;
    * revisit if that workload materializes.
    *
    * 100 TB design: the verify is linear in the candidate stream, and
    * the stream is N·nprobe·(N/nlist) pairs — ~N^1.5·(nprobe/0.7)
    * with the √N-scaled cell count on a corpus with NO cluster
    * structure (this fixture's near-orthogonal randoms, the
    * adversarial case; the exact screen is N²/2 with a bigger
    * constant and no dial). On real embedding corpora near-dups are
    * CLUSTERED — partners land in the home cell or its immediate
    * neighbors, `-Dgraft.ann.nprobe` turns the probe count down, and
    * the stream approaches N·cellsize — the regime SemDeDup-style
    * dedup (cluster, then compare within clusters) exploits by
    * construction. Cost vs the exact path is measured on the
    * decorrelated scaled corpora in DEDUP_SCALE_r13.json. */
  def queryEmbedDedup(spark: SparkSession, sfDir: String,
      info: BuildInfo): DataFrame =
    queryEmbedDedupDialed(spark, sfDir, info,
      Similarity.dedupNprobeFor(info.nl))

  /** [[queryEmbedDedup]] with an explicit probe count — the
    * calibration/override surface (IndexStoreSpec sweeps it; a
    * deployment on clustered real embeddings turns `np` down, which is
    * where the sub-quadratic regime lives — see the public doc). */
  private[operators] def queryEmbedDedupDialed(spark: SparkSession,
      sfDir: String, info: BuildInfo, np: Int): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    // n=0: nothing indexed, nothing to probe — the exact screen is
    // free on an empty/all-invalid corpus and returns the same
    // "everything survives" answer with the same schema
    if (info.n == 0) return Similarity.q45EmbedDedup(spark, sfDir)
    val dir = info.dir
    val e = Similarity.prepped(spark, sfDir).filter(Similarity.validNorm)
    val cents = spark.read.parquet(s"$dir/centroids")
    // Vectors ride INTO the cell join and the exact cosine evaluates
    // inside it (the q34 discipline): an earlier shape materialized
    // bare id pairs, distinct'ed them, and re-joined vectors twice —
    // three shuffles of an N·nprobe·cellsize pair stream that made
    // the "scale path" 1.6× SLOWER than the exact block join at the
    // 8000-vector calibration corpus. Here the only shuffled rows are
    // the N·nprobe probe rows and N home rows (wide, but linear in
    // N), the |probers|×|members| pair evaluations happen in-task,
    // and only the ≥-threshold hits leave the join as bare dropped
    // ids. A pair sharing several probed cells is evaluated once per
    // shared cell — duplicate WORK, bounded by the probe multiplicity,
    // in exchange for never shuffling the pair stream; the trailing
    // distinct dedupes ids, not pairs. Hot cells skew this join at
    // scale; cells are ~√N/0.7 wide by construction and AQE's skew
    // split handles the residual imbalance.
    // bounded-top-k aggregate, not the ranks window (r18): this is the
    // FULL-CORPUS probe pass (every vector probes its np cells), where
    // the former window shuffled and sorted all N×nl scored rows —
    // TopKAgg's map-side partials cap the exchange at N·np structs
    // (see Similarity.topCells; row-identical)
    val probesV = Similarity.topCells(e, cents, np)
      .select(col("vec_id").as("pid"), col("cell"))
      .join(e.select(col("vec_id").as("pid"), col("v").as("vp"),
        col("nrm").as("np_")), Seq("pid"))
    // one row per indexed vector with its home cell: sub 0 always
    // exists (subspaces ≥ 1) — cheaper than a distinct over 8 rows
    val homesV = withDeltaOf(spark, dir, "codes")(
        _.filter(col("sub") === 0))
      .select(col("vec_id").as("iid"), col("cell"))
      .join(e.select(col("vec_id").as("iid"), col("v").as("vi"),
        col("nrm").as("ni")), Seq("iid"))
    // the keeper rule needs only the HIGHER id of a verified pair —
    // either catch direction emits the same greatest(), so the
    // bidirectional union is free
    // shuffle_hash, not sort-merge: past the broadcast threshold Spark
    // would otherwise SORT both sides by cell — the probe side is the
    // big one (N·nprobe wide rows) and a many-to-many cell join gains
    // nothing from sorted inputs. Hash-building the homes side is the
    // scale-correct shape: it is linear in N and partitioned by cell,
    // so each task builds only its cells' members (~√N rows per cell).
    val dropped = probesV.join(homesV.hint("shuffle_hash"), Seq("cell"))
      .filter(col("pid") =!= col("iid") &&
        dotD(col("vp"), col("vi")) / (col("np_") * col("ni")) >=
          Similarity.pairThreshold)
      .select(greatest(col("pid"), col("iid")).as("vec_id"))
      .distinct()
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
      .join(dropped, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** q71: [[queryEmbedDedup]] under the stateless driver contract —
    * per-call [[ensure]] revalidation, like q69/q70; a session-holding
    * pipeline keeps the `info` handle instead. Approximate with
    * ONE-SIDED error (survivors ⊇ q45's exact survivors); the driver
    * gate is Verify's dedup-recall floor against the exact answer. */
  def q71EmbedDedupIdx(spark: SparkSession, sfDir: String): DataFrame =
    queryEmbedDedup(spark, sfDir, ensure(spark, sfDir))
}
