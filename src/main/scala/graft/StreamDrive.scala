package graft

/** Shared drive/measure helpers for everything that feeds the real
  * streaming ingest sinks with synthetic micro-batches and then
  * asserts on what landed: [[IngestProbe]], [[ContentionProbe]], and
  * the contention spec. ONE implementation, deliberately — these
  * were three drifting copies, and the copies had dropped the
  * lag-uniqueness guard that exists to prevent a specific
  * measurement bug (colliding circular-shift lags make batches
  * near-dups of each other; the screen then rejects them wholesale
  * and the "per-batch ingest cost" measures screening with no
  * admission at all — the first svec probe shipped exactly that). */
private[graft] object StreamDrive {

  /** Circular-shift step for [[freshVec]]: the largest candidate ≤ 9
    * coprime with `dim`, so consecutive batch lags walk the full
    * residue ring (distinct, nonzero for any batch count < dim).
    * dim ≤ 1 degenerates to 0 — a 1-dim embedding cannot be
    * decorrelated by shifting, and [[requireDecorrelated]] refuses
    * such fixtures up front. */
  private def stepFor(dim: Int): Int =
    (9 to 1 by -1).find(s => BigInt(s).gcd(BigInt(dim)) == 1).getOrElse(1)

  private def lagFor(batch: Int, dim: Int): Int =
    if (dim <= 1) 0 else ((batch + 1) * stepFor(dim)) % dim

  /** Guard BEFORE generating batches: every lag in [0, nBatches)
    * must be distinct and nonzero at this dim, or batches near-dup
    * each other / the corpus and the caller measures rejection, not
    * ingest. Coprimality makes this hold whenever nBatches < dim;
    * the require keeps the contract honest if either changes. */
  def requireDecorrelated(nBatches: Int, dim: Int): Unit = {
    val lags = (0 until nBatches).map(lagFor(_, dim))
    require(lags.distinct.size == nBatches && !lags.contains(0),
      s"nBatches=$nBatches at dim=$dim yields colliding/zero " +
        "circular-shift lags — batches would near-dup each other or " +
        "the corpus and the screen would reject them wholesale")
  }

  /** Per-batch DECORRELATING map: circular-shift by a per-batch lag
    * (a permutation — cosine-preserving, distribution-preserving),
    * then negate+shift. Distinct lags make cross-batch cosines ~
    * N(0, 1/dim); the negation keeps every batch far from its
    * unshifted corpus source. */
  def freshVec(emb: Array[Float], batch: Int): Array[Float] = {
    val dim = emb.length
    val lag = lagFor(batch, math.max(1, dim))
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      out(j) = -emb((j + lag) % dim) - 0.001f * (batch + 1)
      j += 1
    }
    out
  }

  /** Σ numInputRows over the query's recent progress — the
    * completion-barrier counter (see [[awaitConsumed]]). Callers must
    * raise spark.sql.streaming.numRecentProgressUpdates past their
    * total trigger count: the default 100-entry ring buffer would
    * evict and make the barrier undercount. */
  def progressSum(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.map(_.numInputRows).sum

  /** Completion BARRIER on cumulative source consumption.
    * processAllAvailable alone is racy at long batch times (observed:
    * it returned in 0.4 s while the trigger's real ~30 s of work
    * landed in LATER timed windows). A batch's progress event posts
    * only AFTER its foreachBatch completed, so Σ numInputRows ≥
    * rows-added-so-far is the exact "all my data was processed"
    * signal — independent of how many rows the sink ADMITS. DELTA
    * based: the caller reads the pre-window sum and waits for
    * `before + n` (absolute targets drift when a trigger
    * over-counts, and a drifted target can be satisfied BEFORE the
    * window's work runs). */
  def awaitConsumed(q: org.apache.spark.sql.streaming.StreamingQuery,
      expected: Long, deadlineSec: Long = 600L): Unit = {
    val deadline = System.nanoTime() + deadlineSec * 1000000000L
    var sum = -1L
    while (sum < expected && System.nanoTime() < deadline) {
      q.processAllAvailable()
      sum = progressSum(q)
      if (sum < expected) Thread.sleep(200)
    }
    require(sum >= expected,
      s"ingest barrier timed out: $sum source rows consumed, " +
        s"expected $expected — the sink stalled (deadlock?) or the " +
        "query died")
  }

  /** One id column of a parquet table, retried across a concurrent
    * writer's promote-swap window (rename-aside → rename-in): a read
    * landing exactly inside the swap can transiently miss the dir —
    * the reader-vs-swap seam, not data loss. */
  def readIdsRetried(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): Array[Long] = {
    var left = 5
    while (true) {
      // generation-resolved INSIDE the retry loop: a concurrent
      // forget/compaction can commit a new generation between
      // attempts, and the point of this reader is the live table
      try return spark.read
        .parquet(graft.sources.Generations.resolve(spark, path))
        .select(idCol).collect().map(_.getLong(0))
      catch { case e: Throwable if left > 0 =>
        left -= 1; Thread.sleep(300)
      }
    }
    Array.empty
  }
}
