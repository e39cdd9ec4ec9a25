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
    // fresh ids + decorrelated content per batch via the shared
    // StreamDrive map (a near-dup batch would be screened out
    // wholesale and the lost-write assertion would assert on nothing)
    graft.StreamDrive.requireDecorrelated(4, src.head._2.length)
    def mkBatch(i: Int): Seq[(Long, Array[Float])] =
      src.take(200).zipWithIndex.map { case ((_, emb), j) =>
        (900000000L + i.toLong * 200 + j, graft.StreamDrive.freshVec(emb, i))
      }.toSeq

    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.screenedVectorIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("contention_spec_ckpt").toString)
      .start()
    def corpusIds(): Set[Long] = graft.StreamDrive.readIdsRetried(
      spark, s"$corpusDir/embeddings.parquet", "vec_id").toSet
    // the no-lost-write witness: every id EVER observed in the corpus
    // must survive to the end unless the forget killed it. (Asserting
    // "every batch row lands" would be wrong — the screen LEGITIMATELY
    // drops within-batch near-dups, which the fixture contains by
    // construction; what the lease must guarantee is only that a
    // rewrite never swaps away rows an append already committed.)
    var everSeen = Set.empty[Long]
    def feed(rows: Seq[(Long, Array[Float])]): Unit = {
      val before = graft.StreamDrive.progressSum(q)
      ms.addData(rows)
      graft.StreamDrive.awaitConsumed(q, before + rows.size,
        deadlineSec = 300L)
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

  test("a concurrent docs forget and live docs ingest serialize " +
    "through the corpus + lexical leases: no deadlock, no lost " +
    "admitted doc, kills gone from corpus and BM25 serving") {
    import graft.operators.{LexIndex, Retention}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("contention_docs").toString + "/c"
    val lexDir = LexIndex.dirFor(spark, corpusDir)
    def deleteDir(path: String): Unit = {
      val (fs, p) = graft.Scratch.fs(spark, path)
      if (fs.exists(p)) fs.delete(p, true)
    }
    deleteDir(lexDir)

    val src = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    // per-batch token namespaces (IngestProbe's docScale discipline):
    // zero shingle overlap with the corpus → genuinely admitted
    def mkBatch(i: Int): Seq[(Long, String, String)] =
      src.take(200).zipWithIndex.map { case ((_, text, lang), j) =>
        (900000000L + i.toLong * 200 + j,
          text.split(' ').map(w => s"zz${i}_$w").mkString(" "), lang)
      }.toSeq

    val ms = MemoryStream[(Long, String, String)]
    val q = StreamOps.incrementalIngestStream(
        ms.toDF().toDF("doc_id", "text", "lang"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("contention_docs_ckpt").toString)
      .start()
    def corpusIds(): Set[Long] = graft.StreamDrive.readIdsRetried(
      spark, corpusDir, "doc_id").toSet
    var everSeen = Set.empty[Long]
    def feed(rows: Seq[(Long, String, String)]): Unit = {
      val before = graft.StreamDrive.progressSum(q)
      ms.addData(rows)
      graft.StreamDrive.awaitConsumed(q, before + rows.size,
        deadlineSec = 300L)
      everSeen ++= corpusIds()
    }

    try {
      feed(src.toSeq) // bootstrap: corpus + sh/bands + lexical index
      feed(mkBatch(0))

      val kills = src.map(_._1).filter(_ % 17 == 3)
      assert(kills.nonEmpty)
      val forgetErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val forget = new Thread(() =>
        try Retention.forget(spark, corpusDir,
          docIds = Some(kills.toSeq.toDF("doc_id")))
        catch { case t: Throwable => forgetErr.set(t) },
        "spec-docs-forget")
      forget.start()
      feed(mkBatch(1))
      feed(mkBatch(2))
      forget.join(300000L)
      assert(!forget.isAlive, "docs forget deadlocked against live ingest")
      assert(forgetErr.get() == null,
        s"concurrent docs forget failed: ${forgetErr.get()}")
      feed(mkBatch(3))

      val idSet = corpusIds()
      val lost = (everSeen -- kills) -- idSet
      assert(lost.isEmpty, s"${lost.size} committed doc(s) vanished " +
        s"(e.g. ${lost.take(3).mkString(",")}) — a rewrite swapped " +
        "away an append it raced")
      (0 to 3).foreach { b =>
        assert(mkBatch(b).map(_._1).exists(idSet.contains),
          s"docs batch $b landed no rows at all")
      }
      assert(kills.forall(!idSet.contains(_)),
        "a forgotten doc_id survived the concurrent forget")
      // lexical serving excludes the kills from this instant
      val served = LexIndex.q74Bm25TopKIdx(spark, corpusDir)
        .filter(col("doc_id").isin(kills.toSeq: _*))
      assert(served.isEmpty,
        "post-forget BM25 serving returned a deleted doc")
    } finally {
      try q.stop() catch { case _: Throwable => () }
      deleteDir(LexIndex.dirFor(spark, corpusDir))
      deleteDir(corpusDir)
      deleteDir(corpusDir + "__sh"); deleteDir(corpusDir + "__bands")
    }
  }
}
