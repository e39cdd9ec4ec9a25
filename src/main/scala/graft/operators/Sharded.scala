package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hash-sharded vector store — K independent corpus+index stores
  * behind one root, for CONCURRENT ingest (VERDICT r17 #1).
  *
  * Why: every persisted store here enforces ONE writer at a time
  * ([[graft.sources.WriterLease]]) — correct, but the measured ceiling
  * on ingest throughput: N feeders gain nothing because every batch of
  * every feeder serializes behind the same lease (CONTENTION_r17). The
  * ANN store cannot simply admit concurrent appends — its meta row is
  * a read-modify-write, its `_commit` marker digests the exact file
  * listing, and its torn-state detection compares global counts — so
  * the scale-out shape is the one real deployments use: SHARD the
  * store. Each shard is a COMPLETE store (its own corpus table, its
  * own IVF×PQ index home, its own writer lease, its own retained
  * generations and delta buffer), rows are routed by a content-keyed
  * hash of the id, and queries serve a union view with a global top-k
  * merge. Writers of different shards never share a lease OR an
  * in-JVM monitor ([[IndexStore.monitorFor]]), so K shard appends
  * proceed concurrently — in one JVM on K threads, or from K separate
  * driver JVMs (the 100 TB shape: each feeder process owns the batch
  * it splits; shard leases arbitrate cross-feeder collisions
  * per-shard instead of globally).
  *
  * What sharding preserves, by construction:
  *  - ROUTING is a pure function of vec_id ([[shardOf]]): a replayed
  *    batch routes identically, so the per-shard sinks' replay
  *    idempotence carries over unchanged;
  *  - each shard's lifecycle machinery (ensure/heal, delta folds,
  *    compaction, deletion, generations GC) runs EXACTLY as on an
  *    unsharded store, under that shard's lease — nothing is re-
  *    implemented, Maintenance just gets K smaller stores;
  *  - the serve-side union ([[knnTopK]]) re-ranks with EXACT cosines
  *    per shard and merges per-query top-k lists under the same
  *    (score DESC, id ASC) total order as [[Similarity.rerankTopK]] —
  *    the merge is exact over the per-shard candidate sets, so
  *    sharding changes WHICH candidates are probed (K smaller
  *    quantizers instead of one), not how they are scored.
  *
  * What it trades: each shard trains its own coarse quantizer on 1/K
  * of the data, so per-shard cell geometry differs from the unsharded
  * index (recall is gated, not bit-pinned — q84's floor; measured at
  * the gate scales it matches the unsharded q69 characteristic). K is
  * fixed at store creation ([[ensureShards]] refuses a mismatch) —
  * re-sharding is a rebuild, the standard contract for hash layouts.
  *
  * The reference has no concurrency story at all (it serializes on a
  * single ADF pipeline run / SQL connection — reference
  * df_to_azure/export.py:60-107 runs one upload end to end); this is
  * extension surface sized for the 100 TB ingest path. */
object Sharded {

  /** Default shard count for the gated q84 store: enough to prove the
    * concurrency shape while keeping K index builds cheap at gate
    * scale. A deployment sizes K to its feeder parallelism (and can
    * raise it freely at creation time — routing is mod-K). */
  val defaultShards = 4

  def shardDir(root: String, i: Int): String = s"$root/shard_$i"

  private def shardsMarker(root: String) = s"$root/_shards"

  /** Create-or-validate the sharded layout at `root`: persists K in a
    * `_shards` marker on first call, REFUSES a mismatching K later
    * (silently honoring a different K would route new rows to shards
    * old readers never consult — wrong answers, not an error). */
  def ensureShards(spark: SparkSession, root: String, k: Int): Int = {
    require(k > 0, s"shard count must be positive, got $k")
    val (fs, p) = graft.Scratch.fs(spark, shardsMarker(root))
    def validate(): Int = {
      val persisted = new String(graft.Scratch.readSmallFile(fs, p),
        "UTF-8").trim.toInt
      require(persisted == k,
        s"sharded store at $root was created with $persisted shards; " +
          s"caller asked for $k — resharding a hash layout is a " +
          "rebuild, not a config change")
      persisted
    }
    if (fs.exists(p)) validate()
    else {
      fs.mkdirs(new org.apache.hadoop.fs.Path(root))
      // write-then-RENAME so the marker appears with its content
      // atomically (a bare create-exclusive exists as an EMPTY file
      // before the write lands — a racing reader parsed ""); losing
      // the rename race is fine as long as the winner wrote the same
      // K (two feeders bootstrapping one root concurrently — the
      // cross-feeder case): re-read and validate instead of failing
      // the batch
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"._shards_tmp_${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(k.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, p)) k
      else {
        fs.delete(tmp, false)
        validate()
      }
    }
  }

  /** Persisted shard count, or None for a root that was never
    * shard-initialized. */
  def shardCount(spark: SparkSession, root: String): Option[Int] = {
    val (fs, p) = graft.Scratch.fs(spark, shardsMarker(root))
    if (!fs.exists(p)) None
    else Some(new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
      .trim.toInt)
  }

  /** Routing column: content-keyed (a replayed row routes the same),
    * uniform under xxhash64, non-negative via pmod. */
  def shardOf(k: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("vec_id")), lit(k.toLong)).cast("int")

  /** Ingest ONE micro-batch into the sharded store: dedupe once
    * (deterministic keeper), split by [[shardOf]], and run the K
    * per-shard sink bodies CONCURRENTLY — each is exactly
    * [[graft.streaming.StreamOps.vecIngestBatch]] against its shard's
    * corpus dir, holding that shard's own lease. A shard body failure
    * fails the whole batch loudly (foreachBatch retries/replays it;
    * per-shard replay idempotence makes the re-run converge — shards
    * that already committed anti-join the resend away).
    *
    * CROSS-FEEDER CONTRACT: multiple feeders (streams/JVMs) may drive
    * one sharded root concurrently — shard leases serialize their
    * per-shard appends and the bootstrap re-probes its marker inside
    * the lease — but each vec_id must be OWNED by one feeder (the
    * Kafka-partition discipline): two feeders racing the SAME id can
    * land it twice in a shard's corpus (each feeder's admission
    * anti-join ran against a snapshot that predates the other's
    * append), which the next ensure() REFUSES loudly as a
    * duplicate-keyed corpus. Id ownership is the natural shape anyway
    * — a feeder fleet splits its source by the same kind of hash this
    * store shards by. */
  def ingestVecBatch(spark: SparkSession, root: String, k: Int,
      batch: DataFrame): Unit = {
    val kk = ensureShards(spark, root, k)
    val b = graft.Materialize(
      graft.streaming.StreamOps.dedupBatchDeterministic(batch)
        .withColumn("__shard", shardOf(kk)))
    eachShardConcurrently(root, kk) { (i, sd) =>
      graft.streaming.StreamOps.vecIngestBatch(spark, sd,
        b.filter(col("__shard") === i).drop("__shard"))
    }
    ()
  }

  /** Shard corpus dirs that have bootstrapped (first batch landed). */
  private def liveShards(spark: SparkSession, root: String,
      k: Int): Seq[String] =
    (0 until k).map(shardDir(root, _)).filter { sd =>
      val (fs, p) = graft.Scratch.fs(spark, s"$sd/embeddings.parquet")
      fs.exists(p)
    }

  /** Union corpus view over all bootstrapped shards, each leg
    * generation-resolved (readers of a sharded store see the same
    * snapshot isolation as readers of one store — per shard). */
  def vecCorpus(spark: SparkSession, root: String): DataFrame = {
    val k = shardCount(spark, root).getOrElse(throw new IllegalStateException(
      s"no sharded store at $root — ensureShards/ingest first"))
    val live = liveShards(spark, root, k)
    require(live.nonEmpty, s"sharded store at $root has no " +
      "bootstrapped shard yet — nothing to read")
    live.map(Tables.load(spark, _, "embeddings")).reduce(_.unionByName(_))
  }

  /** ANN top-k over the sharded store: each shard serves the SHARED
    * query batch from its own persisted IVF×PQ index
    * ([[IndexStore.queryIvfPqFrom]] — exact cosines out), then the
    * per-shard top-k lists merge to the global top-k per query under
    * the same (cosine DESC, id ASC) order every ANN variant uses. The
    * merge input is ≤ K·k rows per query — driver-trivial at any
    * corpus size; the heavy lifting stays inside each shard's pruned
    * probe. Queries = the union corpus's vec_id < knnQueries rows
    * (materialized once, not re-unioned per shard). */
  def knnTopK(spark: SparkSession, root: String): DataFrame =
    knnTopKWith(spark, root, vecCorpus(spark, root)
      .filter(col("vec_id") < Similarity.knnQueries)
      .select(col("vec_id"), col("embedding")))

  /** [[knnTopK]] with an EXPLICIT query batch — external query
    * vectors against the sharded store (the probe mains use it with
    * synthetic ids; a retrieval deployment with query vectors that
    * are not corpus members uses it directly). `queries` =
    * (vec_id, embedding) with every vec_id < `maxQuery`;
    * `maxQuery` ≤ [[Similarity.knnQueries]] (the shared pqLut query
    * filter — [[IndexStore.queryIvfPqFrom]] enforces it). */
  def knnTopKWith(spark: SparkSession, root: String, queries: DataFrame,
      kk: Int = Similarity.k,
      maxQuery: Long = Similarity.knnQueries): DataFrame = {
    val k = shardCount(spark, root).getOrElse(throw new IllegalStateException(
      s"no sharded store at $root"))
    val q = graft.Materialize(
      queries.select(col("vec_id"), col("embedding")))
    val legs = liveShards(spark, root, k).map { sd =>
      IndexStore.queryIvfPqFrom(spark, sd,
        IndexStore.ensure(spark, sd), q, kk, maxQuery)
    }
    require(legs.nonEmpty, s"sharded store at $root has no live shard")
    legs.reduce(_.unionByName(_))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg
        .topkAgg(col("cosine"), col("neighbor_id"), kk)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Run `body(i, shardDir)` for every shard concurrently (the
    * ingest's thread pattern — per-shard leases + monitors make
    * cross-shard work embarrassingly parallel); first failure fails
    * the call loudly after all threads finish. */
  private def eachShardConcurrently[T](root: String, k: Int)(
      body: (Int, String) => T): Seq[T] = {
    val out = new java.util.concurrent.ConcurrentHashMap[Int, T]()
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until k).map { i =>
      val t = new Thread(() => {
        try out.put(i, body(i, shardDir(root, i)))
        catch { case e: Throwable => failures.add(e) }
      }, s"graft-shard-task-$i")
      t.setDaemon(true); t.start(); t
    }
    threads.foreach(_.join())
    if (!failures.isEmpty)
      throw new RuntimeException(s"sharded operation failed in " +
        s"${failures.size} of $k shard(s); first: " +
        failures.peek().getMessage, failures.peek())
    (0 until k).flatMap(i => Option(out.get(i)))
  }

  /** Retention / right-to-be-forgotten over the SHARDED store —
    * lifecycle parity with the unsharded layout ([[Retention
    * .forget]]'s vec side): ids route to their shard by the same
    * content hash ingest used, and each owning shard runs its own
    * full deletion discipline (tombstones + corpus rewrite under the
    * shard's lease, fold on request) concurrently with the others.
    * Ids hashing to a never-bootstrapped shard cannot exist and are
    * skipped. Idempotent per shard (absent ids no-op), so a replayed
    * forget converges; a forget can run against live sharded ingest
    * — per-shard leases serialize them shard by shard. */
  def forget(spark: SparkSession, root: String, vecIds: DataFrame,
      foldNow: Boolean = false): Retention.ForgetStats = {
    val k = shardCount(spark, root).getOrElse(throw new IllegalStateException(
      s"no sharded store at $root — nothing to forget"))
    val ids = graft.Materialize(vecIds.select(col("vec_id")).distinct()
      .withColumn("__shard", shardOf(k)))
    val live = liveShards(spark, root, k).toSet
    val stats = eachShardConcurrently(root, k) { (i, sd) =>
      if (!live.contains(sd)) None
      else {
        val own = ids.filter(col("__shard") === i).drop("__shard")
        if (own.isEmpty) None
        else Some(Retention.forget(spark, sd, vecIds = Some(own),
          foldNow = foldNow))
      }
    }.flatten
    stats.foldLeft(Retention.ForgetStats(0, 0, 0, 0,
      foldedLex = false, foldedAnn = false)) { (a, s) =>
      Retention.ForgetStats(0, 0, a.vecsTombstoned + s.vecsTombstoned,
        a.vecsRemovedFromCorpus + s.vecsRemovedFromCorpus,
        foldedLex = false, foldedAnn = a.foldedAnn || s.foldedAnn)
    }
  }

  /** Maintenance sweep over every live shard, concurrently: fold the
    * delta buffers / tombstones out of each shard's ANN index and
    * reap expired generations — the per-shard form of the unsharded
    * compaction cadence ([[graft.sources.Maintenance
    * .compactAnnIndex]]). */
  def maintain(spark: SparkSession, root: String): Unit = {
    val k = shardCount(spark, root).getOrElse(throw new IllegalStateException(
      s"no sharded store at $root — nothing to maintain"))
    val live = liveShards(spark, root, k).toSet
    eachShardConcurrently(root, k) { (_, sd) =>
      if (live.contains(sd)) {
        val idx = IndexStore.dirFor(spark, sd)
        if (IndexStore.hasIndex(spark, idx))
          graft.sources.Maintenance.compactAnnIndex(spark, idx)
        graft.sources.Generations.gc(spark, s"$sd/embeddings.parquet")
      }
    }
    ()
  }

  private def shardStoreDirFor(spark: SparkSession, sfDir: String): String =
    graft.Scratch.stableDir(spark, "shardstore", sfDir)

  /** Build-or-validate the gated sharded store for `sfDir`'s
    * embeddings table: K shard corpora split by [[shardOf]], seeded
    * with the source-fingerprint discipline the scratch pipelines use
    * (a source change wipes and reseeds; the per-shard index homes are
    * wiped with it — they are keyed by shard PATH, not seed). Under
    * the GLOBAL IndexStore monitor like the other seeded pipelines
    * (Verify dumps from several threads). */
  private[graft] def ensureShardStore(spark: SparkSession,
      sfDir: String): String = IndexStore.synchronized {
    val root = shardStoreDirFor(spark, sfDir)
    val src = Tables.load(spark, sfDir, "embeddings")
    val seedId = s"graftshard|1|$defaultShards|" +
      DeletePipeline.cachedSourceId(spark, sfDir, "embeddings",
        "xxhash64(vec_id, embedding)")
    val homes = (0 until defaultShards)
      .map(i => IndexStore.dirFor(spark, shardDir(root, i)))
    DeletePipeline.ensureSeeded(spark, root, seedId, homes)(
      shardCount(spark, root).nonEmpty) {
      ensureShards(spark, root, defaultShards)
      val mat = graft.Materialize(
        src.withColumn("__shard", shardOf(defaultShards)))
      (0 until defaultShards).foreach { i =>
        mat.filter(col("__shard") === i).drop("__shard")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"${shardDir(root, i)}/embeddings.parquet")
      }
    }
    root
  }

  /** q84: ANN top-k served from the SHARDED persisted store — the
    * concurrent-ingest layout's serve leg. Same query batch and k as
    * q35/q65/q69; recall-gated against the exact brute-force top-k
    * (Verify.annFloors — approximate serving, like every sibling; the
    * corpus CONTENT equals the embeddings table, only its physical
    * layout is K hash shards, so q35 is the exact baseline
    * unchanged). */
  def q84KnnSharded(spark: SparkSession, sfDir: String): DataFrame =
    knnTopK(spark, ensureShardStore(spark, sfDir))
}
