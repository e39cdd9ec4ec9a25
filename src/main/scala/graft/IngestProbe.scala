package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scratch scale-probe for the STREAMING ingest pair (not part of the
  * driver contract): [[graft.streaming.StreamOps.vectorIngestStream]]
  * and [[graft.streaming.StreamOps.incrementalIngestStream]] claim
  * per-batch cost ∝ batch (anti-join/screen scans of single-column
  * indexes, encode of the batch only — never a corpus retrain). This
  * probe MEASURES that claim instead of arguing it: bootstrap a scratch
  * corpus at two scales, feed K fixed-size micro-batches through the
  * real streaming sinks, and report the per-batch median at each scale
  * plus the fitted exponent e = ln(tBig/tSmall)/ln(nBig/nSmall) —
  * cost ∝ batch shows up as e ≈ 0 (the id-column anti-join scans grow
  * with the corpus but are a few percent of a batch's encode/screen
  * work at these scales; a retrain-per-batch bug would read e ≈ 1).
  *
  * Emits one `{"metric":"ingestprobe",...}` JSON line (same artifact
  * discipline as Bench/ScaleProbe). Batch CONTENT is derived from the
  * source corpus with per-batch id offsets / token namespaces so every
  * batch is genuinely fresh (admitted, indexed) — a suppressed batch
  * would measure the screen only, not the append path. Host-noise
  * caveat as everywhere here: single-shot batch times; compare shape,
  * not absolutes.
  */
object IngestProbe {

  private def f3(v: Double): String = Json.f3(v)

  final case class ScaleRun(label: String, corpusRows: Long,
      bootstrapSec: Double, batchSecs: Seq[Double],
      batchRowsTotal: Long = 0L, bytesGrowth: Long = 0L) {
    def batchMed: Double = {
      val s = batchSecs.sorted
      if (s.isEmpty) -1.0 else s(s.size / 2)
    }
    /** Headline capacity (VERDICT r17 #7): measured-batch rows and
      * store-growth bytes over the summed measured window — the
      * number a 100 TB deployment scale-projects from (bootstrap
      * excluded: one-time build). */
    def json: String = {
      val tot = batchSecs.sum
      val cap =
        if (batchRowsTotal <= 0 || tot <= 0) ""
        else s""","rows_per_sec":${f3(batchRowsTotal / tot)}""" +
          s""","bytes_per_sec":${f3(bytesGrowth / tot)}"""
      s"""{"label":${Json.str(label)},"corpus_rows":$corpusRows,""" +
        s""""bootstrap_sec":${f3(bootstrapSec)},""" +
        s""""batch_sec":[${batchSecs.map(f3).mkString(",")}],""" +
        s""""batch_med":${f3(batchMed)}$cap}"""
    }
  }

  /** ln(tBig/tSmall)/ln(nBig/nSmall) over the first and last scale. */
  private def exponent(runs: Seq[ScaleRun]): Double = {
    val (a, b) = (runs.head, runs.last)
    if (a.batchMed <= 0 || b.batchMed <= 0 || b.corpusRows <= a.corpusRows)
      Double.NaN
    else math.log(b.batchMed / a.batchMed) /
      math.log(b.corpusRows.toDouble / a.corpusRows)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-ingestprobe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val nBatches = 4
    // the consumption barrier sums recentProgress — a RING BUFFER
    // (default 100 entries); raise it far past any probe's trigger
    // count so eviction can never make the barrier undercount and
    // spin to its deadline
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    // lag-uniqueness guard for freshVec (64-dim fixtures): congruent
    // or zero lags re-create the wholesale-rejection measurement bug
    // the per-batch decorrelation exists to fix (the guard + map now
    // live in StreamDrive, shared with the contention harnesses)
    StreamDrive.requireDecorrelated(nBatches, 64)
    val scales = Seq(
      ("sf0.1", "/root/testdata/sf0.1"),
      ("big", sys.env.getOrElse("GRAFT_INGEST_BIG_DIR", "/tmp/sfbig")))
    Bench.warmup(spark, scales.head._2)

    def deleteDir(path: String): Unit = {
      val (fs, p) = Scratch.fs(spark, path)
      if (fs.exists(p)) fs.delete(p, true)
    }
    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    /** Store growth for the bytes/sec capacity line: sum of current
      * file lengths under the store dirs (one recursive listing). */
    def bytesUnder(paths: Seq[String]): Long = paths.map { d =>
      val (fs, p) = Scratch.fs(spark, d)
      if (!fs.exists(p)) 0L else Scratch.walkFiles(fs, p).map(_.getLen).sum
    }.sum
    // barrier + decorrelating map: ONE implementation in
    // [[StreamDrive]] (shared with the contention harnesses — the
    // rationale docs live there)
    def progressSum(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      StreamDrive.progressSum(q)
    def awaitConsumed(q: org.apache.spark.sql.streaming.StreamingQuery,
        expected: Long): Unit = StreamDrive.awaitConsumed(q, expected)
    def freshVec(emb: Array[Float], batch: Int): Array[Float] =
      StreamDrive.freshVec(emb, batch)

    /** Vector path: bootstrap = corpus write + index build (batch 1);
      * then fixed 500-vector batches, ids offset out of the corpus
      * range, embeddings negated+shifted so content is fresh too. */
    def vecScale(label: String, srcDir: String,
        batchSize: Int = 1000): ScaleRun = {
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"ingestprobe_vec_$label").toString + "/c"
      val idxDir = operators.IndexStore.dirFor(spark, corpusDir)
      val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      // deployment-shaped default batch size: big enough that the
      // batch's own encode dominates the per-batch fixed costs (the
      // ~nlist per-cell file writes grow with √N and would otherwise
      // read as a phantom corpus-size exponent at sliver-sized
      // batches); the capacity runs vary it (VERDICT r17 #7)
      // POSITION-based fresh ids from a 9e8 base: source-id+offset
      // schemes collide across batches on replicated corpora
      // (non-contiguous replica blocks), and a 1e7 base collides with
      // make_ann_calib's replica-10 id range (r·1e6, r ≤ 63) — either
      // way a batch becomes a partial replay no-op and measures
      // nothing. 9e8 is beyond every fixture's id space.
      val batchData = (0 until nBatches).map { i =>
        src.take(batchSize).zipWithIndex.map { case ((_, emb), j) =>
          (900000000L + i.toLong * batchSize + j, freshVec(emb, i))
        }.toSeq
      }
      val ms = MemoryStream[(Long, Array[Float])]
      val q = streaming.StreamOps.vectorIngestStream(
          ms.toDF().toDF("vec_id", "embedding"), corpusDir)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"ip_vec_ckpt_$label").toString)
        .start()
      try {
        val boot = timed {
          val before = progressSum(q)
          ms.addData(src.toSeq)
          awaitConsumed(q, before + src.length)
        }
        val bytes0 = bytesUnder(Seq(corpusDir, idxDir))
        val batchSecs = batchData.map { b =>
          timed {
            val before = progressSum(q)
            ms.addData(b)
            awaitConsumed(q, before + b.size)
          }
        }
        ScaleRun(label, src.length.toLong, boot, batchSecs,
          batchData.map(_.size.toLong).sum,
          bytesUnder(Seq(corpusDir, idxDir)) - bytes0)
      } finally {
        q.stop()
        deleteDir(idxDir); deleteDir(corpusDir)
      }
    }

    /** Screened vector path: [[graft.streaming.StreamOps
      * .screenedVectorIngestStream]] — vecScale's shape plus the
      * semantic screen (probe + cell-pruned lists verify + exact
      * within-batch pass) and the veclists append. Batch content is
      * fresh (negated+shifted → cosine −1 vs the corpus), so every
      * batch pays screen AND full admission — the claim under test is
      * that the screen's lists reads stay pruned to the probed cells
      * and per-batch cost stays ∝ batch. */
    def svecScale(label: String, srcDir: String,
        batchSize: Int = 1000): ScaleRun = {
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"ingestprobe_svec_$label").toString + "/c"
      val idxDir = operators.IndexStore.dirFor(spark, corpusDir)
      val vlDir = operators.IngestScreen.listsDir(spark, corpusDir)
      val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      // position-based ids + per-batch decorrelation — see vecScale
      // and freshVec; every batch row must be genuinely ADMITTED or
      // the probe measures screening without the append path
      val batchData = (0 until nBatches).map { i =>
        src.take(batchSize).zipWithIndex.map { case ((_, emb), j) =>
          (900000000L + i.toLong * batchSize + j, freshVec(emb, i))
        }.toSeq
      }
      val ms = MemoryStream[(Long, Array[Float])]
      val q = streaming.StreamOps.screenedVectorIngestStream(
          ms.toDF().toDF("vec_id", "embedding"), corpusDir)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"ip_svec_ckpt_$label").toString)
        .start()
      try {
        val boot = timed {
          val before = progressSum(q)
          ms.addData(src.toSeq)
          awaitConsumed(q, before + src.length)
        }
        val bytes0 = bytesUnder(Seq(corpusDir, idxDir, vlDir))
        val batchSecs = batchData.map { b =>
          timed {
            val before = progressSum(q)
            ms.addData(b)
            awaitConsumed(q, before + b.size)
          }
        }
        ScaleRun(label, src.length.toLong, boot, batchSecs,
          batchData.map(_.size.toLong).sum,
          bytesUnder(Seq(corpusDir, idxDir, vlDir)) - bytes0)
      } finally {
        q.stop()
        deleteDir(idxDir); deleteDir(vlDir); deleteDir(corpusDir)
      }
    }

    /** Docs path: bootstrap = corpus + shingle/band index build; then
      * fixed 200-doc batches whose tokens live in a per-batch
      * namespace (no shingle overlap with the corpus → admitted, full
      * index append measured, not just the screen). */
    def docScale(label: String, srcDir: String,
        batchSize: Int = 500): ScaleRun = {
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"ingestprobe_doc_$label").toString + "/c"
      val src = spark.read.parquet(s"$srcDir/documents.parquet")
        .select("doc_id", "text", "lang")
        .as[(Long, String, String)].collect()
      // default 500: deployment-shaped; see vecScale's note
      // position-based ids — same collision rationale as vecScale
      val batchData = (0 until nBatches).map { i =>
        src.take(batchSize).zipWithIndex.map { case ((t, j)) =>
          (900000000L + i.toLong * batchSize + j,
            t._2.split(' ').map(w => s"zz${i}_$w").mkString(" "), t._3)
        }.toSeq
      }
      val ms = MemoryStream[(Long, String, String)]
      val q = streaming.StreamOps.incrementalIngestStream(
          ms.toDF().toDF("doc_id", "text", "lang"), corpusDir)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"ip_doc_ckpt_$label").toString)
        .start()
      try {
        val boot = timed {
          val before = progressSum(q)
          ms.addData(src.toSeq)
          awaitConsumed(q, before + src.length)
        }
        val bytes0 = bytesUnder(Seq(corpusDir, corpusDir + "__sh", corpusDir + "__bands"))
        val batchSecs = batchData.map { b =>
          timed {
            val before = progressSum(q)
            ms.addData(b)
            awaitConsumed(q, before + b.size)
          }
        }
        ScaleRun(label, src.length.toLong, boot, batchSecs,
          batchData.map(_.size.toLong).sum,
          bytesUnder(Seq(corpusDir, corpusDir + "__sh", corpusDir + "__bands")) - bytes0)
      } finally {
        q.stop()
        deleteDir(corpusDir + "__sh"); deleteDir(corpusDir + "__bands")
        deleteDir(corpusDir)
      }
    }

    val vecRuns = scales.map { case (l, d) => vecScale(l, d) }
    val svecRuns = scales.map { case (l, d) => svecScale(l, d) }
    val docRuns = scales.map { case (l, d) => docScale(l, d) }
    // capacity runs (VERDICT r17 #7): the SECOND batch size at the
    // gate scale — together with the default-size runs above, each
    // sink gets rows/sec + bytes/sec at two batch sizes, the headline
    // figure a deployment scale-projects ingest capacity from
    val capVec = vecScale("sf0.1_b2000", scales.head._2, 2000)
    val capSvec = svecScale("sf0.1_b2000", scales.head._2, 2000)
    val capDoc = docScale("sf0.1_b1000", scales.head._2, 1000)
    def fmtExp(e: Double): String = if (e.isNaN) "null" else f3(e)
    println(s"""{"metric":"ingestprobe","batches":$nBatches,""" +
      s""""vec":[${vecRuns.map(_.json).mkString(",")}],""" +
      s""""svec":[${svecRuns.map(_.json).mkString(",")}],""" +
      s""""docs":[${docRuns.map(_.json).mkString(",")}],""" +
      s""""capacity":{"vec":[${vecRuns.head.json},${capVec.json}],""" +
      s""""svec":[${svecRuns.head.json},${capSvec.json}],""" +
      s""""docs":[${docRuns.head.json},${capDoc.json}]},""" +
      s""""exponent":{"vec":${fmtExp(exponent(vecRuns))},""" +
      s""""svec":${fmtExp(exponent(svecRuns))},""" +
      s""""docs":${fmtExp(exponent(docRuns))}}}""")
    spark.stop()
  }
}
