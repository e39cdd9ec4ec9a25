package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamOps

/** Sharded vector store (VERDICT r17 #1): K complete stores behind
  * one root, rows routed by a content hash, concurrent per-shard
  * ingest, union serve with an exact global top-k merge.
  *
  * What these tests pin:
  *  - layout identity: shard count persists, a mismatching K is
  *    refused (silent re-sharding would strand rows in shards readers
  *    never consult);
  *  - TWO CONCURRENT FEEDERS (disjoint id streams, the cross-feeder
  *    contract) into one root: every fed id lands exactly once in the
  *    union corpus, every shard's index validates, nothing deadlocks
  *    — the lease/monitor claim the sharded layout exists for;
  *  - replay idempotence: re-ingesting an already-committed batch is
  *    a no-op (routing is content-keyed, per-shard sinks anti-join);
  *  - the union serve stays correct across a shard's compaction
  *    (per-shard maintenance composes with the union view);
  *  - q84 (the gated serve) returns ≤ k ranked rows per query with
  *    exact cosines, and its recall vs the exact brute-force top-k
  *    clears the gate floor on the fixture corpus. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def deleteDir(path: String): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"shard_$tag").toString + "/s"

  test("ensureShards persists K and refuses a mismatch") {
    val root = freshRoot("layout")
    try {
      assert(Sharded.shardCount(spark, root).isEmpty)
      assert(Sharded.ensureShards(spark, root, 4) === 4)
      assert(Sharded.shardCount(spark, root) === Some(4))
      assert(Sharded.ensureShards(spark, root, 4) === 4)
      val e = intercept[IllegalArgumentException] {
        Sharded.ensureShards(spark, root, 8)
      }
      assert(e.getMessage.contains("resharding"))
    } finally deleteDir(root)
  }

  test("two concurrent feeders with disjoint id streams converge: " +
    "every id exactly once in the union corpus, all shards validate, " +
    "replay is a no-op") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot("feeders")
    val k = 4
    val shardHomes = (0 until k)
      .map(i => IndexStore.dirFor(spark, Sharded.shardDir(root, i)))
    val src = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    graft.StreamDrive.requireDecorrelated(4, src.head._2.length)
    // feeder f (0/1) owns ids ≡ f under the FEEDER split; content is
    // decorrelated per (feeder, batch) via the shared StreamDrive map
    def mkBatch(feeder: Int, batch: Int): Seq[(Long, Array[Float])] =
      src.take(150).zipWithIndex.map { case ((_, emb), j) =>
        (800000000L + (j.toLong * 2 + feeder) + batch.toLong * 10000L,
          graft.StreamDrive.freshVec(emb, feeder * 2 + batch))
      }.toSeq

    val ms0 = MemoryStream[(Long, Array[Float])]
    val ms1 = MemoryStream[(Long, Array[Float])]
    val q0 = StreamOps.shardedVectorIngestStream(
        ms0.toDF().toDF("vec_id", "embedding"), root, k)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("shard_ckpt0").toString)
      .start()
    val q1 = StreamOps.shardedVectorIngestStream(
        ms1.toDF().toDF("vec_id", "embedding"), root, k)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("shard_ckpt1").toString)
      .start()
    try {
      // both feeders' batches in flight CONCURRENTLY, including the
      // bootstrap race (both see an un-bootstrapped store)
      val fed = (0 until 2).flatMap { batch =>
        val b0 = mkBatch(0, batch)
        val b1 = mkBatch(1, batch)
        ms0.addData(b0)
        ms1.addData(b1)
        b0 ++ b1
      }
      q0.processAllAvailable()
      q1.processAllAvailable()
      val fedIds = fed.map(_._1)
      assert(fedIds.distinct.size === fedIds.size) // harness sanity

      val corpus = Sharded.vecCorpus(spark, root)
        .select("vec_id").as[Long].collect()
      assert(corpus.length === corpus.distinct.length,
        "an id landed twice — a feeder's admission raced another's " +
          "append on the same id (contract violation or lost lease)")
      assert(corpus.toSet === fedIds.toSet,
        s"union corpus diverged from the fed set: missing " +
          s"${(fedIds.toSet -- corpus.toSet).take(3)}, extra " +
          s"${(corpus.toSet -- fedIds.toSet).take(3)}")
      // every bootstrapped shard validates WITHOUT a rebuild — a
      // bootstrap race that lost rows would fail the identity check
      (0 until k).foreach { i =>
        val sd = Sharded.shardDir(root, i)
        val (fs, p) = graft.Scratch.fs(spark, s"$sd/embeddings.parquet")
        if (fs.exists(p))
          assert(!IndexStore.ensure(spark, sd).builtNow,
            s"shard $i failed validation after concurrent ingest")
      }
      // replay idempotence: a duplicate delivery of feeder 0's first
      // batch (same content — the checkpoint replay shape) no-ops
      Sharded.ingestVecBatch(spark, root, k,
        mkBatch(0, 0).toDF("vec_id", "embedding"))
      val after = Sharded.vecCorpus(spark, root)
        .select("vec_id").as[Long].collect()
      assert(after.sorted.toSeq === corpus.sorted.toSeq,
        "replaying a committed batch changed the corpus")
    } finally {
      q0.stop(); q1.stop()
      deleteDir(root)
      shardHomes.foreach(deleteDir)
    }
  }

  test("union serve survives a shard's compaction; q84 serves ranked " +
    "exact cosines above the gate floor") {
    val root = Sharded.ensureShardStore(spark, sfDir)
    val k = Sharded.shardCount(spark, root).get
    val served = Sharded.knnTopK(spark, root)
    val rows = served.collect()
    assert(rows.nonEmpty)
    // ≤ k results per query, ranks contiguous from 1, cosine
    // non-increasing within a query (the exact-merge order)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= Similarity.k)
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks === (1 to rs.length),
        s"query $q ranks not contiguous: $ranks")
      val cosByRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cosByRank.zip(cosByRank.tail).forall { case (a, b) => a >= b },
        s"query $q cosines not non-increasing")
    }
    // recall vs the exact brute-force top-k clears the q84 gate floor
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.q35KnnBrute(spark, sfDir))
    val got = pairs(served)
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= graft.Verify.annFloors("q84_knn_sharded"),
      s"sharded serve recall $recall below the gate floor")
    // a shard's compaction (own lease, own generations) must not
    // disturb the union view or the serve
    val sd0 = (0 until k).map(Sharded.shardDir(root, _)).head
    val before = Sharded.vecCorpus(spark, root).count()
    graft.sources.Maintenance.compactAnnIndex(spark,
      IndexStore.dirFor(spark, sd0))
    assert(Sharded.vecCorpus(spark, root).count() === before)
    assert(pairs(Sharded.knnTopK(spark, root)) === got,
      "a content-preserving shard compaction changed the served top-k")
  }

  test("sharded forget: ids vanish from the union corpus AND the " +
    "served top-k across their owning shards, a replay no-ops, " +
    "foldNow folds, maintain sweeps every shard") {
    val root = freshRoot("forget")
    val k = 4
    val shardHomes = (0 until k)
      .map(i => IndexStore.dirFor(spark, Sharded.shardDir(root, i)))
    try {
      val src = graft.sources.Tables.load(spark, sfDir, "embeddings")
        .select("embedding").as[Array[Float]].take(300)
      val batch = src.zipWithIndex.map { case (e, j) =>
        (810000000L + j, e)
      }.toSeq
      Sharded.ingestVecBatch(spark, root, k,
        batch.toDF("vec_id", "embedding"))
      val all = batch.map(_._1)
      val doomed = all.filter(_ % 7 == 0)
      assert(doomed.size > 10) // spread across shards by the hash
      val st = Sharded.forget(spark, root, doomed.toDF("vec_id"))
      assert(st.vecsRemovedFromCorpus === doomed.size.toLong,
        s"expected ${doomed.size} removed, got $st")
      val left = Sharded.vecCorpus(spark, root)
        .select("vec_id").as[Long].collect().toSet
      assert(left === all.toSet -- doomed.toSet,
        "union corpus after forget diverged from the survivors")
      // serve with the FORGOTTEN rows' own vectors as queries: their
      // exact match (cosine 1) must no longer be served from any shard
      val qdf = batch.filter(r => doomed.take(8).contains(r._1))
        .zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
        .toDF("vec_id", "embedding")
      val served = Sharded.knnTopKWith(spark, root, qdf,
        kk = 5, maxQuery = 8)
      val leaked = served.select("neighbor_id").as[Long].collect()
        .toSet intersect doomed.toSet
      assert(leaked.isEmpty, s"forgotten ids still served: $leaked")
      // replay converges: nothing left to remove
      val again = Sharded.forget(spark, root, doomed.toDF("vec_id"))
      assert(again.vecsRemovedFromCorpus === 0L &&
        again.vecsTombstoned === 0L,
        s"replayed forget was not a no-op: $again")
      // foldNow: physical removal path runs per owning shard
      val doomed2 = all.filter(i => i % 11 == 3 && i % 7 != 0)
      val st2 = Sharded.forget(spark, root, doomed2.toDF("vec_id"),
        foldNow = true)
      assert(st2.vecsRemovedFromCorpus === doomed2.size.toLong)
      assert(st2.foldedAnn, "foldNow did not fold any owning shard")
      // maintenance sweep composes: serve still correct afterwards
      Sharded.maintain(spark, root)
      val fin = Sharded.vecCorpus(spark, root)
        .select("vec_id").as[Long].collect().toSet
      assert(fin === all.toSet -- doomed.toSet -- doomed2.toSet)
    } finally {
      deleteDir(root)
      shardHomes.foreach(deleteDir)
    }
  }

  test("sharded forget races a LIVE sharded ingest batch: per-shard " +
    "leases serialize them and both effects land — the committed kill " +
    "set vanishes, the concurrent disjoint batch survives") {
    val root = freshRoot("racefgt")
    val k = 4
    val shardHomes = (0 until k)
      .map(i => IndexStore.dirFor(spark, Sharded.shardDir(root, i)))
    try {
      val src = graft.sources.Tables.load(spark, sfDir, "embeddings")
        .select("embedding").as[Array[Float]].take(240)
      def ids(base: Long, n: Int): Seq[Long] = (0 until n).map(base + _)
      val b1 = ids(820000000L, 160).zip(src.take(160))
      Sharded.ingestVecBatch(spark, root, k,
        b1.toDF("vec_id", "embedding"))
      // the kill set is COMMITTED (all of batch 1's multiples of 5)
      // and the racing batch is DISJOINT from it, so the outcome is
      // deterministic under ANY interleaving: forget removes exactly
      // the kill set, ingest lands exactly batch 2 — the per-shard
      // leases only decide the ORDER each shard applies them in
      val doomed = b1.map(_._1).filter(_ % 5 == 0)
      val b2 = ids(820500000L, 80).zip(src.drop(160))
      val errs =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tf = new Thread(() => {
        try Sharded.forget(spark, root, doomed.toDF("vec_id"))
        catch { case e: Throwable => errs.add(e) }
      }, "race-forget")
      val ti = new Thread(() => {
        try Sharded.ingestVecBatch(spark, root, k,
          b2.toDF("vec_id", "embedding"))
        catch { case e: Throwable => errs.add(e) }
      }, "race-ingest")
      tf.start(); ti.start(); tf.join(); ti.join()
      assert(errs.isEmpty, s"racing forget/ingest failed: " +
        s"${Option(errs.peek()).map(_.getMessage)}")
      val fin = Sharded.vecCorpus(spark, root)
        .select("vec_id").as[Long].collect()
      assert(fin.length === fin.distinct.length,
        "a row landed twice under the race")
      assert(fin.toSet ===
        (b1.map(_._1).toSet -- doomed.toSet) ++ b2.map(_._1).toSet,
        "racing forget+ingest did not serialize to the deterministic " +
          "outcome")
      // every shard still validates and the forgotten ids never serve
      (0 until k).foreach { i =>
        IndexStore.ensure(spark, Sharded.shardDir(root, i))
      }
      val qdf = b1.filter(r => doomed.take(6).contains(r._1))
        .zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
        .toDF("vec_id", "embedding")
      val leaked = Sharded.knnTopKWith(spark, root, qdf,
          kk = 5, maxQuery = 6)
        .select("neighbor_id").as[Long].collect()
        .toSet intersect doomed.toSet
      assert(leaked.isEmpty, s"forgotten ids served after the race: $leaked")
    } finally {
      deleteDir(root)
      shardHomes.foreach(deleteDir)
    }
  }
}
