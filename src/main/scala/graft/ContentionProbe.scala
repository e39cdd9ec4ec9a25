package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contended-lease probe (VERDICT r15 #4): INGEST_r15b priced the
  * writer lease uncontended; the design claim the lease exists for is
  * that a retention delete can run against LIVE ingest — two real
  * Spark workloads on one corpus, serialized by the corpus-dir and
  * index leases, converging with no deadlock and no lost write. This
  * probe measures that claim: a [[graft.streaming.StreamOps
  * .screenedVectorIngestStream]] processes fixed-size micro-batches
  * while [[graft.operators.Retention.forget]] erases a kill set of
  * the seeded corpus from another thread.
  *
  * Reported: per-batch seconds before / overlapping / after the
  * forget window, the contended forget's duration, and an UNCONTENDED
  * control forget (run after the stream stops, second kill set) — the
  * contention premium is the paired difference, host noise caveats as
  * everywhere. Convergence is asserted, not reported: every admitted
  * batch id present exactly once, every killed id gone from corpus
  * and serving, ensure validates the final store.
  *
  *   sbt "runMain graft.ContentionProbe /root/testdata/sf0.1"
  */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-contentionprobe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    Bench.warmup(spark, srcDir)

    val corpusDir = java.nio.file.Files
      .createTempDirectory("contention_probe").toString + "/c"
    val idxDir = operators.IndexStore.dirFor(spark, corpusDir)
    val vlDir = operators.IngestScreen.listsDir(spark, corpusDir)
    def deleteDir(path: String): Unit = {
      val (fs, p) = Scratch.fs(spark, path)
      if (fs.exists(p)) fs.delete(p, true)
    }
    Seq(idxDir, vlDir).foreach(deleteDir)

    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val batchSize = 1000
    // 3 pre + ≤12 contended + 3 post: guard the decorrelation up
    // front (StreamDrive carries the lag-uniqueness contract the
    // first copy of this harness silently dropped)
    val maxBatches = 18
    StreamDrive.requireDecorrelated(maxBatches, src.head._2.length)
    def mkBatch(i: Int): Seq[(Long, Array[Float])] =
      src.take(batchSize).zipWithIndex.map { case ((_, emb), j) =>
        (900000000L + i.toLong * batchSize + j,
          StreamDrive.freshVec(emb, i))
      }.toSeq

    val ms = MemoryStream[(Long, Array[Float])]
    val q = streaming.StreamOps.screenedVectorIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("contention_ckpt").toString)
      .start()
    // lost-write witness (see the convergence block): every id EVER
    // observed in the corpus must survive to the end unless killed —
    // the screen legitimately drops within-batch near-dups, so
    // "every batch row lands" would be the wrong assertion. Reads are
    // retried across the forget's promote-swap window.
    var everSeen = Set.empty[Long]
    def corpusIdArray(): Array[Long] =
      StreamDrive.readIdsRetried(spark,
        s"$corpusDir/embeddings.parquet", "vec_id")
    def timedBatch(i: Int): Double = {
      val before = StreamDrive.progressSum(q)
      val b = mkBatch(i)
      val t0 = System.nanoTime()
      ms.addData(b)
      StreamDrive.awaitConsumed(q, before + b.size)
      val s = (System.nanoTime() - t0) / 1e9
      everSeen ++= corpusIdArray()
      s
    }
    def f3(v: Double) = Json.f3(v)
    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted; if (s.isEmpty) -1.0 else s(s.size / 2)
    }

    try {
      // bootstrap: the seeded corpus + index build through the sink
      val t0 = System.nanoTime()
      ms.addData(src.toSeq)
      StreamDrive.awaitConsumed(q, src.length.toLong)
      val bootSec = (System.nanoTime() - t0) / 1e9

      val preSecs = (0 until 3).map(timedBatch)

      // the contended window: a retention forget of seeded ids runs
      // while batches keep flowing. Kill mods keep nlistFor inside
      // the boundary so the delete exercises the incremental path.
      val kills1 = src.map(_._1).filter(_ % 142 == 3)
      require(kills1.nonEmpty, "kill set 1 is empty")
      val forgetSec = new java.util.concurrent.atomic.AtomicLong(-1L)
      val forgetErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val forgetThread = new Thread(() =>
        try {
          val t = System.nanoTime()
          operators.Retention.forget(spark, corpusDir,
            vecIds = Some(kills1.toSeq.toDF("vec_id")))
          forgetSec.set(System.nanoTime() - t)
        } catch { case e: Throwable => forgetErr.set(e) },
        "contention-forget")
      forgetThread.start()
      val contSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 3
      while (forgetThread.isAlive && i < 3 + 12) {
        contSecs += timedBatch(i); i += 1
      }
      forgetThread.join(600000L)
      require(!forgetThread.isAlive, "forget thread still alive after " +
        "10 min — deadlock between retention and live ingest")
      require(forgetErr.get() == null,
        s"contended forget failed: ${forgetErr.get()}")

      val postSecs = (i until i + 3).map(timedBatch)
      val lastBatch = i + 2

      // convergence: no lost write, no resurrected kill
      val corpusIds = corpusIdArray()
      require(corpusIds.length == corpusIds.distinct.length,
        "duplicate vec_ids in the final corpus")
      val idSet = corpusIds.toSet
      val killSet = kills1.toSet
      val lost = (everSeen -- killSet) -- idSet
      require(lost.isEmpty, s"${lost.size} committed row(s) vanished " +
        s"(e.g. ${lost.take(3).mkString(",")}) — a corpus rewrite " +
        "swapped away an ingest append it raced")
      (0 to lastBatch).foreach { b =>
        require(mkBatch(b).map(_._1).exists(idSet.contains),
          s"batch $b landed no rows at all — an entire admission was " +
            "suppressed in the contended window")
      }
      require(killSet.forall(!idSet.contains(_)),
        "a forgotten vec_id survived in the corpus")
      val info = operators.IndexStore.ensure(spark, corpusDir)
      val leaks = operators.IndexStore.queryIvfPq(spark, corpusDir, info)
        .filter(col("neighbor_id").isin(killSet.toSeq: _*)).count()
      require(leaks == 0, s"post-forget serving leaked $leaks deleted " +
        "neighbor(s)")

      // uncontended control: same forget shape, stream stopped
      q.stop()
      val kills2 = spark.read.parquet(graft.sources.Generations
          .resolve(spark, s"$corpusDir/embeddings.parquet"))
        .select("vec_id").as[Long].collect().filter(_ % 151 == 5)
      require(kills2.nonEmpty, "kill set 2 is empty")
      val tU = System.nanoTime()
      operators.Retention.forget(spark, corpusDir,
        vecIds = Some(kills2.toSeq.toDF("vec_id")))
      val unconSec = (System.nanoTime() - tU) / 1e9

      println(s"""{"probe":"contention","sf":${Json.str(srcDir)},""" +
        s""""corpus_rows":${src.length},"batch_size":$batchSize,""" +
        s""""bootstrap_sec":${f3(bootSec)},""" +
        s""""pre_batch_sec":[${preSecs.map(f3).mkString(",")}],""" +
        s""""pre_batch_med":${f3(med(preSecs))},""" +
        s""""contended_batch_sec":[${contSecs.map(f3).mkString(",")}],""" +
        s""""contended_batch_med":${f3(med(contSecs.toSeq))},""" +
        s""""post_batch_sec":[${postSecs.map(f3).mkString(",")}],""" +
        s""""post_batch_med":${f3(med(postSecs))},""" +
        s""""forget_contended_sec":${f3(forgetSec.get() / 1e9)},""" +
        s""""forget_killed":${kills1.length},""" +
        s""""forget_uncontended_sec":${f3(unconSec)},""" +
        s""""uncontended_killed":${kills2.length},""" +
        s""""converged":true}""")
    } finally {
      try q.stop() catch { case _: Throwable => () }
      Seq(idxDir, vlDir).foreach(deleteDir)
      deleteDir(corpusDir)
    }
    spark.stop()
  }
}
