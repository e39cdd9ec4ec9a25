package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Commit marker for the streaming ingest indexes (`<corpus>__sh`,
  * `<corpus>__bands`) — the docs-ingest analogue of the ANN index's
  * validation token ([[graft.operators.IndexStore]] `vtoken`).
  *
  * The ingest screen must never trust UNCOMMITTED index rows (a batch
  * that crashed between its index appends and its corpus append leaves
  * orphaned rows whose ghosts would suppress legitimate admissions —
  * see [[StreamOps.incrementalIngestStream]]). The original guard
  * semi-joined both indexes against the corpus's doc_ids EVERY batch:
  * correct, but it re-scanned and re-shuffled the full indexes per
  * micro-batch — the dominant corpus-size-dependent term in the
  * per-batch cost (IngestProbe measured exponent ~0.27).
  *
  * This marker replaces that steady-state scan with driver-side file
  * metadata: one line per COMMITTED index part file (relative path +
  * length). The sink's write discipline makes file-granularity commit
  * exact — each append creates fresh part files holding only that
  * batch's docs, and the batch's docs commit together with the corpus
  * append — so "committed rows" = "rows in committed files", and
  * reading exactly the marker-listed files equals the semi-join's
  * visibility filter with ZERO per-batch corpus/index scans. Single
  * writer per corpus dir (same contract as the sink itself).
  *
  * Recovery: a missing/corrupt marker, or a listed file that vanished
  * or changed length (compaction, external rewrite), fails validation
  * and the sink falls back to the full committed-semi-join for that
  * batch, then repairs the marker with [[committedListing]] — one
  * file-granularity commit scan — so the fast path re-engages next
  * batch. Deleting the marker is therefore always safe.
  */
object IngestCommit {

  final case class Marker(sh: Map[String, Long], bands: Map[String, Long])

  private val header = "graftingest|1"

  def markerPath(corpusDir: String): String = corpusDir + "__commit"

  /** Fully-qualified dir root + "/" — the prefix both the listing and
    * `_metadata.file_path` rows reduce to relative paths against. */
  def qualifiedBase(spark: SparkSession, dir: String): String = {
    val (fs, root) = graft.Scratch.fs(spark, dir)
    fs.makeQualified(root).toString + "/"
  }

  /** Data files under an index dir as (relative path -> length);
    * hidden/marker files excluded. Missing dir → empty. */
  def listing(spark: SparkSession, dir: String): Map[String, Long] = {
    val (fs, root) = graft.Scratch.fs(spark, dir)
    if (!fs.exists(root)) return Map.empty
    val base = fs.makeQualified(root).toString + "/"
    graft.Scratch.walkFiles(fs, root)
      .filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .map(s => (s.getPath.toString.stripPrefix(base), s.getLen)).toMap
  }

  /** The subset of `all` whose every row references a doc in
    * `committed` — the repair pass that rebuilds the marker after a
    * validation failure. One scan of the index's doc_id column plus an
    * anti-join; only the (bounded-by-file-count) offending file paths
    * return to the driver. */
  def committedListing(spark: SparkSession, dir: String,
      all: Map[String, Long], committed: DataFrame): Map[String, Long] = {
    if (all.isEmpty) return all
    val base = qualifiedBase(spark, dir)
    val bad = spark.read.parquet(dir)
      .select(col("doc_id"), col("_metadata.file_path").as("__f"))
      .join(committed, Seq("doc_id"), "left_anti")
      .select(col("__f")).distinct().collect()
      .map(r => new Path(r.getString(0)).toString.stripPrefix(base)).toSet
    all.filterNot { case (f, _) => bad.contains(f) }
  }

  /** Read + parse the marker; None on absence or any malformation
    * (the caller falls back to the semi-join and repairs). */
  def read(spark: SparkSession, corpusDir: String): Option[Marker] = {
    val (fs, p) = graft.Scratch.fs(spark, markerPath(corpusDir))
    if (!fs.exists(p)) return None
    val text =
      try {
        val in = fs.open(p)
        try {
          // drain to EOF — a remote FS may return a short first read
          val buf = new java.io.ByteArrayOutputStream(4096)
          val bytes = new Array[Byte](4096)
          var n = in.read(bytes)
          while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
          new String(buf.toByteArray, "UTF-8")
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => return None }
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty || lines.head != header) return None
    val sh = Map.newBuilder[String, Long]
    val bands = Map.newBuilder[String, Long]
    try {
      lines.tail.foreach { l =>
        l.split('|') match {
          case Array("sh", f, len) => sh += ((f, len.toLong))
          case Array("bands", f, len) => bands += ((f, len.toLong))
          case _ => return None
        }
      }
      Some(Marker(sh.result(), bands.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Overwrite the marker. A crash mid-write leaves a truncated file
    * that fails [[read]]'s parse — the fallback+repair path absorbs
    * it, same trust class as the ANN vtoken. Write failures are
    * perf-only (next batch falls back), so they log, not throw. */
  def write(spark: SparkSession, corpusDir: String, m: Marker): Unit =
    try {
      val (fs, p) = graft.Scratch.fs(spark, markerPath(corpusDir))
      val out = fs.create(p, true)
      val body = (Seq(header) ++
        m.sh.toSeq.sorted.map { case (f, l) => s"sh|$f|$l" } ++
        m.bands.toSeq.sorted.map { case (f, l) => s"bands|$f|$l" })
        .mkString("\n")
      try out.write(body.getBytes("UTF-8")) finally out.close()
    } catch { case e: Throwable =>
      System.err.println(s"[ingest] commit marker write failed at " +
        s"${markerPath(corpusDir)} (${e.getMessage}); next batch will " +
        "re-validate via the committed semi-join")
    }
}
