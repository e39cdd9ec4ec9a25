package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IndexStore, IngestScreen, Retention}

/** Retention-vs-live-ingest contention (VERDICT r15 #4): a
  * [[Retention.forget]] runs CONCURRENTLY with a live
  * [[StreamOps.screenedVectorIngestStream]] on one corpus — two real
  * Spark workloads arbitrated by the corpus-dir + index writer
  * leases. WriterLeaseSpec pins the lease mechanics thread-vs-thread;
  * this spec pins the WORKLOAD claim: no deadlock (both finish inside
  * a bounded window), no lost write (every admitted batch row is in
  * the final corpus — a forget's corpus rewrite never swaps away an
  * append it raced), no resurrected kill, and the final store
  * validates and serves leak-free. */
class ContentionSpec extends SparkSpec {
  import spark.implicits._

  test("a concurrent forget and live screened ingest serialize " +
    "through the leases: no deadlock, no lost admitted row, kills " +
    "gone from corpus and serving") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("contention_spec").toString + "/c"
    val idxDir = IndexStore.dirFor(spark, corpusDir)
    val vlDir = IngestScreen.listsDir(spark, corpusDir)
    def deleteDir(path: String): Unit = {
      val (fs, p) = graft.Scratch.fs(spark, path)
      if (fs.exists(p)) fs.delete(p, true)
    }
    Seq(idxDir, vlDir).foreach(deleteDir)

    val src = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    // fresh ids + decorrelated content per batch (IngestProbe's
    // discipline — a near-dup batch would be screened out wholesale
    // and the lost-write assertion would assert on nothing)
    def freshVec(emb: Array[Float], batch: Int): Array[Float] = {
      val lag = (batch + 1) * 8 % math.max(1, emb.length)
      val out = new Array[Float](emb.length)
      var j = 0
      while (j < emb.length) {
        out(j) = -emb((j + lag) % emb.length) - 0.001f * (batch + 1)
        j += 1
      }
      out
    }
    def mkBatch(i: Int): Seq[(Long, Array[Float])] =
      src.take(200).zipWithIndex.map { case ((_, emb), j) =>
        (900000000L + i.toLong * 200 + j, freshVec(emb, i))
      }.toSeq

    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.screenedVectorIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("contention_spec_ckpt").toString)
      .start()
    def progressSum: Long = q.recentProgress.map(_.numInputRows).sum
    // retried: a read landing exactly inside the forget's
    // promote-swap window (rename-aside → rename-in) can transiently
    // miss the dir — that's the reader-vs-swap seam, not a lost write
    def corpusIds(): Set[Long] = {
      var left = 5
      while (true) {
        try return spark.read.parquet(s"$corpusDir/embeddings.parquet")
          .select("vec_id").as[Long].collect().toSet
        catch { case e: Throwable if left > 0 =>
          left -= 1; Thread.sleep(300)
        }
      }
      Set.empty
    }
    // the no-lost-write witness: every id EVER observed in the corpus
    // must survive to the end unless the forget killed it. (Asserting
    // "every batch row lands" would be wrong — the screen LEGITIMATELY
    // drops within-batch near-dups, which the fixture contains by
    // construction; what the lease must guarantee is only that a
    // rewrite never swaps away rows an append already committed.)
    var everSeen = Set.empty[Long]
    def feed(rows: Seq[(Long, Array[Float])]): Unit = {
      val before = progressSum
      ms.addData(rows)
      val deadline = System.nanoTime() + 300L * 1000000000L
      var sum = -1L
      while (sum < before + rows.size && System.nanoTime() < deadline) {
        q.processAllAvailable()
        sum = progressSum
        if (sum < before + rows.size) Thread.sleep(100)
      }
      assert(sum >= before + rows.size,
        "ingest barrier timed out — deadlock or dead query")
      everSeen ++= corpusIds()
    }

    try {
      feed(src.toSeq) // bootstrap: corpus + index + lists
      feed(mkBatch(0)) // uncontended warm batch

      val kills = src.map(_._1).filter(_ % 17 == 3)
      assert(kills.nonEmpty)
      val forgetErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val forget = new Thread(() =>
        try Retention.forget(spark, corpusDir,
          vecIds = Some(kills.toSeq.toDF("vec_id")))
        catch { case t: Throwable => forgetErr.set(t) },
        "spec-forget")
      forget.start()
      // live batches racing the forget's tombstone stamp + rewrite
      feed(mkBatch(1))
      feed(mkBatch(2))
      forget.join(300000L)
      assert(!forget.isAlive, "forget deadlocked against live ingest")
      assert(forgetErr.get() == null,
        s"concurrent forget failed: ${forgetErr.get()}")
      feed(mkBatch(3)) // post-forget batch still admits

      val idSet = corpusIds()
      val lost = (everSeen -- kills) -- idSet
      assert(lost.isEmpty, s"${lost.size} committed row(s) vanished " +
        s"(e.g. ${lost.take(3).mkString(",")}) — a rewrite swapped " +
        "away an append it raced")
      // fresh content admits: each contended batch must have landed
      // SOMETHING (a wholesale suppression would make the lost-write
      // check vacuous)
      (0 to 3).foreach { b =>
        assert(mkBatch(b).map(_._1).exists(idSet.contains),
          s"batch $b landed no rows at all — the contended window " +
            "suppressed an entire admission")
      }
      assert(kills.forall(!idSet.contains(_)),
        "a forgotten vec_id survived the concurrent forget")
      val info = IndexStore.ensure(spark, corpusDir)
      assert(IndexStore.queryIvfPq(spark, corpusDir, info)
        .filter(col("neighbor_id").isin(kills.toSeq: _*)).isEmpty,
        "post-forget serving leaked a deleted neighbor")
    } finally {
      try q.stop() catch { case _: Throwable => () }
      Seq(idxDir, vlDir).foreach(deleteDir)
      deleteDir(corpusDir)
    }
  }
}
