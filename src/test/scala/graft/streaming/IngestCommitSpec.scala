package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** The ingest commit marker ([[IngestCommit]]): the fast path must be
  * semantically invisible — every behavior here is the committed-
  * semi-join contract, now served from file metadata. */
class IngestCommitSpec extends SparkSpec {

  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog"
  private val textC = "colorless green ideas sleep furiously every single night"

  private def freshCorpusDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/corpus"

  private def startIngest(ms: MemoryStream[(Long, String, String)],
      corpusDir: String) =
    StreamOps.incrementalIngestStream(
        ms.toDF().toDF("doc_id", "text", "lang"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("ic_ckpt").toString)
      .start()

  private def corpusIds(corpusDir: String): Seq[Long] =
    spark.read.parquet(corpusDir).select("doc_id").as[Long]
      .collect().sorted.toSeq

  test("marker round-trip: write → read is identity; malformed or " +
    "missing reads are None") {
    val dir = freshCorpusDir("ic_rt")
    val m = IngestCommit.Marker(
      Map("pfx=3/part-a.parquet" -> 123L, "pfx=7/part-b.parquet" -> 9L),
      Map("part-c.parquet" -> 42L),
      Map("part-d.parquet" -> 7L))
    assert(IngestCommit.read(spark, dir).isEmpty)
    IngestCommit.write(spark, dir, m)
    assert(IngestCommit.read(spark, dir).contains(m))
    // truncated/corrupt marker parses to None, never to a wrong Marker
    val (fs, p) = graft.Scratch.fs(spark, IngestCommit.markerPath(dir))
    val out = fs.create(p, true)
    out.write("graftingest|2\nsh|owner|data|extra".getBytes("UTF-8"))
    out.close()
    assert(IngestCommit.read(spark, dir).isEmpty)
    // a v1 marker (pre-corpus-identity format) is rejected outright:
    // one fallback semi-join batch repairs it as v2
    val out2 = fs.create(p, true)
    out2.write("graftingest|1\nsh|a.parquet|5".getBytes("UTF-8"))
    out2.close()
    assert(IngestCommit.read(spark, dir).isEmpty)
  }

  test("a foreign corpus rewrite (doc deletion) invalidates the " +
    "marker: the deleted doc's ghost index rows go dark instead of " +
    "suppressing a legitimate admission (ADVICE r13)") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_foreign")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textC, "en")))
      q.processAllAvailable()
      ms.addData(Seq((2L, textA, "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L))
      // foreign writer deletes doc 2 by rewriting the corpus in place;
      // the sh/bands indexes and the marker still carry doc 2's rows
      val survivors = spark.read.parquet(corpusDir)
        .filter($"doc_id" =!= 2L)
      val keep = survivors.collect()
      val schema = survivors.schema
      val (cfs, cp) = graft.Scratch.fs(spark, corpusDir)
      cfs.delete(cp, true)
      spark.createDataFrame(
        java.util.Arrays.asList(keep: _*), schema).write.parquet(corpusDir)
      // a near-dup of the DELETED doc arrives: its text is no longer
      // in the committed corpus, so it must be admitted — the corpus
      // section of the marker sees the rewrite, falls back to the
      // semi-join, and the ghost rows filter out
      ms.addData(Seq((3L, textA + " today", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 3L),
        "ghost index rows of a foreign-deleted doc suppressed a " +
          "legitimate admission")
    } finally q.stop()
  }

  test("never-replayed orphan index rows stay invisible: later batches' " +
    "marker stamps don't bless them, and their ghosts never suppress " +
    "future admissions") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_orphan")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textC, "en")))
      q.processAllAvailable()
      // a crashed batch that is NEVER replayed (checkpoint lost): doc
      // 50's index rows exist, its corpus row never will
      val orphan = Dedup.shingleIndex(
        Seq((50L, textA, "en")).toDF("doc_id", "text", "lang"))
      Dedup.withShPfx(orphan).write.mode("append").partitionBy("pfx")
        .parquet(corpusDir + "__sh")
      Dedup.minhashBands(orphan).write.mode("append")
        .parquet(corpusDir + "__bands")
      // an unrelated batch commits and re-stamps the marker — the stamp
      // must union marker+own, NOT bless the full dir listing
      ms.addData(Seq(
        (2L, "entirely different words about seven distinct topics now",
          "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L))
      // a near-dup of the orphaned doc arrives: the ghost must not
      // suppress it (its text is nowhere in the committed corpus)
      ms.addData(Seq((51L, textA + " today", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 51L))
    } finally q.stop()
  }

  test("deleting the marker is safe: the batch falls back to the " +
    "committed semi-join, answers identically, and repairs the marker") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_del")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textA, "en"), (2L, textC, "en")))
      q.processAllAvailable()
      val (fs, p) = graft.Scratch.fs(spark, IngestCommit.markerPath(corpusDir))
      assert(fs.exists(p))
      fs.delete(p, false)
      // fallback batch: 3 near-dups 1 (rejected), 4 fresh (admitted)
      ms.addData(Seq(
        (3L, textA + " today", "en"),
        (4L, "entirely different words about seven distinct topics now",
          "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
      // the batch repaired the marker: present, and its file set covers
      // the live listing (lockstep state — nothing uncommitted on disk)
      val mk = IngestCommit.read(spark, corpusDir)
      assert(mk.nonEmpty)
      assert(mk.get.sh.keySet ===
        IngestCommit.listing(spark, corpusDir + "__sh").keySet)
      assert(mk.get.bands.keySet ===
        IngestCommit.listing(spark, corpusDir + "__bands").keySet)
      // and the fast path serves the NEXT batch correctly
      ms.addData(Seq((5L, textC + " indeed", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("marker repair excludes files holding uncommitted rows at file " +
    "granularity") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_repair")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textC, "en")))
      q.processAllAvailable()
      // orphan + marker loss together: the repair scan (not the stamp
      // union) must keep the orphan's files out
      val orphan = Dedup.shingleIndex(
        Seq((60L, textA, "en")).toDF("doc_id", "text", "lang"))
      Dedup.withShPfx(orphan).write.mode("append").partitionBy("pfx")
        .parquet(corpusDir + "__sh")
      Dedup.minhashBands(orphan).write.mode("append")
        .parquet(corpusDir + "__bands")
      val (fs, p) = graft.Scratch.fs(spark, IngestCommit.markerPath(corpusDir))
      fs.delete(p, false)
      ms.addData(Seq(
        (2L, "entirely different words about seven distinct topics now",
          "en")))
      q.processAllAvailable()
      // repaired marker exists but leaves the orphan's rows out: a
      // near-dup of doc 60 is admitted on the FAST path
      assert(IngestCommit.read(spark, corpusDir).nonEmpty)
      ms.addData(Seq((61L, textA + " yesterday", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 61L))
    } finally q.stop()
  }

  test("a lost marker stamp (crash between corpus append and stamp) " +
    "heals: the batch's committed index files re-enter the marker and " +
    "keep screening") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_stampcrash")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textC, "en")))
      q.processAllAvailable()
      val preB = IngestCommit.read(spark, corpusDir).get
      // batch B commits fully...
      ms.addData(Seq((2L, textA, "en")))
      q.processAllAvailable()
      // ...but its marker stamp is lost (crash after the corpus
      // append): the stale pre-B marker is still VALID (every file it
      // lists exists unchanged), so without extras resolution the fast
      // path would hide B's index rows forever and its replay would
      // admit nothing new (all rows drop as exact fp dups)
      IngestCommit.write(spark, corpusDir, preB)
      // an unrelated batch runs on the stale-but-valid marker; the
      // dedup screen must still see B's rows, so a near-dup of doc 2
      // in the SAME batch is rejected
      ms.addData(Seq(
        (3L, textA + " today", "en"),
        (4L, "entirely different words about seven distinct topics now",
          "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
      // and the heal is durable: the re-stamped marker covers B's files
      val healed = IngestCommit.read(spark, corpusDir).get
      assert(preB.sh.keySet.subsetOf(healed.sh.keySet))
      assert(healed.sh.keySet.size > preB.sh.keySet.size)
    } finally q.stop()
  }

  test("an all-sub-3-token corpus (no shingle rows at all) never wedges " +
    "the stream: file-less index dirs read as empty, real docs still " +
    "ingest later") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_tiny")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      // bootstrap admits both tiny docs; shingleIndex filters them so
      // NO sh/bands files exist afterwards (the sink skips empty
      // writes — a zero-row partitionBy would leave a footer-less dir)
      ms.addData(Seq((1L, "a b", "en"), (2L, "c d", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L))
      // the next batch must not throw on the file-less dirs (marker is
      // empty → invalid → the fallback read needs the empty-listing
      // guard); exact dup of 1 still drops via the fp anti-join
      ms.addData(Seq((3L, "a b", "en"), (4L, textA, "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
      // real docs index normally from here: near-dup of 4 rejected
      ms.addData(Seq((5L, textA + " today", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
      // and compaction of this shape holds the absent-dir invariant
      graft.sources.Maintenance.compactIngestIndexes(spark, corpusDir)
      ms.addData(Seq((6L, textA + " yesterday", "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("compaction re-stamps the marker and the fast path keeps serving") {
    implicit val ctx = spark.sqlContext
    val corpusDir = freshCorpusDir("ic_compact")
    val ms = MemoryStream[(Long, String, String)]
    val q = startIngest(ms, corpusDir)
    try {
      ms.addData(Seq((1L, textA, "en"), (2L, textC, "en")))
      q.processAllAvailable()
      ms.addData(Seq(
        (3L, "entirely different words about seven distinct topics now",
          "en")))
      q.processAllAvailable()
      graft.sources.Maintenance.compactIngestIndexes(spark, corpusDir)
      val mk = IngestCommit.read(spark, corpusDir)
      assert(mk.nonEmpty)
      assert(mk.get.sh.keySet ===
        IngestCommit.listing(spark, corpusDir + "__sh").keySet)
      // post-compaction batches dedupe correctly from the re-stamped
      // marker: 4 near-dups 1, 5 is fresh
      ms.addData(Seq(
        (4L, textA + " today", "en"),
        (5L, "seven completely unrelated tokens forming one new doc",
          "en")))
      q.processAllAvailable()
      assert(corpusIds(corpusDir) === Seq(1L, 2L, 3L, 5L))
    } finally q.stop()
  }
}
