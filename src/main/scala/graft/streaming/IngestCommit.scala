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
  *
  * The `corpus` section (marker v2) records the CORPUS dir's data-file
  * listing at stamp time, and validation requires every recorded file
  * to still exist unchanged (a SUBSET check — later appends only add
  * files, and a crash between a corpus append and its stamp leaves
  * benign extras). This folds the corpus's identity into marker
  * validity the way the ANN vtoken folds it into the index token: a
  * FOREIGN corpus rewrite (e.g. doc deletions compacted in by an
  * external writer) invalidates the marker, so the batch falls back to
  * the committed semi-join and the deleted docs' index rows go dark —
  * where file-granularity visibility alone would have kept serving
  * their ghosts under the single-writer assumption (ADVICE r13). */
object IngestCommit {

  final case class Marker(sh: Map[String, Long], bands: Map[String, Long],
      corpus: Map[String, Long])

  private val header = "graftingest|2"

  def markerPath(corpusDir: String): String = corpusDir + "__commit"

  /** Fully-qualified dir root + "/" — the prefix both the listing and
    * `_metadata.file_path` rows reduce to relative paths against.
    * Generation-resolved: a dir that compaction/retention migrated to
    * the retained-generation layout lists/reads its newest committed
    * generation, and GC of retired generations can never invalidate a
    * marker that vouched for current files (see
    * [[graft.sources.Generations]]). */
  def qualifiedBase(spark: SparkSession, dir: String): String = {
    val (fs, root) = graft.Scratch.fs(spark,
      graft.sources.Generations.resolve(spark, dir))
    fs.makeQualified(root).toString + "/"
  }

  /** Data files under an index dir as (relative path -> length);
    * hidden/marker files excluded. Missing dir → empty.
    * Generation-resolved (see [[qualifiedBase]]). */
  def listing(spark: SparkSession, dir: String): Map[String, Long] = {
    val (fs, root) = graft.Scratch.fs(spark,
      graft.sources.Generations.resolve(spark, dir))
    if (!fs.exists(root)) return Map.empty
    val base = fs.makeQualified(root).toString + "/"
    graft.Scratch.walkFiles(fs, root)
      .map(s => (s.getPath.toString.stripPrefix(base), s.getLen))
      // hidden-ness checked on EVERY path segment, not just the file
      // name: Spark's directory reads ignore whole hidden dirs, so a
      // crashed job's `_temporary/.../part-x.parquet` debris must stay
      // out of the marker too — listed, it would either be vouched as
      // committed (duplicate rows served via the marker's explicit-
      // path read that the fallback full-dir read ignores) or, as a
      // corpus entry, be deleted by the next job's committer cleanup
      // and spuriously invalidate the marker every batch
      .filterNot { case (rel, _) =>
        rel.split('/').exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
      }.toMap
  }

  /** Logical schemas of the two index tables — explicit on every
    * marker-driven read so no per-batch footer inference runs and no
    * absent column ever reads back as NULL (a user schema naming a
    * column that exists neither in the files nor as a partition dir
    * silently yields NULLs, which would poison the (pfx, doc_id)
    * join). */
  def shSchema(withPfx: Boolean): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val base = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sh", ArrayType(StringType))))
    if (withPfx) base.add(StructField("pfx", IntegerType)) else base
  }

  def bandsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("band", IntegerType),
      StructField("sig", LongType)))
  }

  /** Read exactly `files` (relative to `dir`) with an explicit schema;
    * an EMPTY file set returns a typed empty frame instead of the
    * AnalysisException a file-less read throws — the all-sub-3-token
    * corpus writes no shingle files at all, and the screen must treat
    * that as "no index rows", not wedge the stream. */
  def readFiles(spark: SparkSession, dir: String, files: Iterable[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val base = qualifiedBase(spark, dir)
    spark.read
      .option("basePath", graft.sources.Generations.resolve(spark, dir))
      .schema(schema)
      .parquet(files.toSeq.sorted.map(base + _): _*)
  }

  /** Relative paths among `files` holding ANY row whose doc_id is not
    * in `committed` — the file-granularity commit test. Only the
    * offending paths (bounded by file count) return to the driver. */
  def uncommittedOf(spark: SparkSession, dir: String,
      files: Map[String, Long],
      schema: org.apache.spark.sql.types.StructType,
      committed: DataFrame): Set[String] = {
    if (files.isEmpty) return Set.empty
    val base = qualifiedBase(spark, dir)
    readFiles(spark, dir, files.keys, schema)
      .select(col("doc_id"), col("_metadata.file_path").as("__f"))
      .join(committed, Seq("doc_id"), "left_anti")
      .select(col("__f")).distinct().collect()
      .map(r => new Path(r.getString(0)).toString.stripPrefix(base)).toSet
  }

  /** The subset of `all` whose every row references a doc in
    * `committed` — the repair pass that rebuilds the marker after a
    * validation failure, and the resolver for files found on disk
    * beyond a VALID marker (a batch that crashed between its corpus
    * append and its marker stamp leaves committed-but-unstamped files;
    * a never-replayed crashed batch leaves true orphans — the corpus
    * membership of their rows is what tells them apart). */
  def committedListing(spark: SparkSession, dir: String,
      all: Map[String, Long],
      schema: org.apache.spark.sql.types.StructType,
      committed: DataFrame): Map[String, Long] = {
    val bad = uncommittedOf(spark, dir, all, schema, committed)
    all.filterNot { case (f, _) => bad.contains(f) }
  }

  /** Read + parse the marker; None on absence or any malformation
    * (the caller falls back to the semi-join and repairs). */
  def read(spark: SparkSession, corpusDir: String): Option[Marker] = {
    val (fs, p) = graft.Scratch.fs(spark, markerPath(corpusDir))
    if (!fs.exists(p)) return None
    val text =
      try new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
      catch { case scala.util.control.NonFatal(_) => return None }
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty || lines.head != header) return None
    val sh = Map.newBuilder[String, Long]
    val bands = Map.newBuilder[String, Long]
    val corpus = Map.newBuilder[String, Long]
    try {
      lines.tail.foreach { l =>
        l.split('|') match {
          case Array("sh", f, len) => sh += ((f, len.toLong))
          case Array("bands", f, len) => bands += ((f, len.toLong))
          case Array("corpus", f, len) => corpus += ((f, len.toLong))
          case _ => return None
        }
      }
      Some(Marker(sh.result(), bands.result(), corpus.result()))
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
        m.bands.toSeq.sorted.map { case (f, l) => s"bands|$f|$l" } ++
        m.corpus.toSeq.sorted.map { case (f, l) => s"corpus|$f|$l" })
        .mkString("\n")
      try out.write(body.getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(e) =>
      // NonFatal only: an OOM/interrupt mid-stamp must propagate, not
      // be logged as a perf-only marker miss while the JVM is dying
      System.err.println(s"[ingest] commit marker write failed at " +
        s"${markerPath(corpusDir)} (${e.getMessage}); next batch will " +
        "re-validate via the committed semi-join")
    }
}
