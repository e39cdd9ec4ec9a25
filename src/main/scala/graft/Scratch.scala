package graft

import org.apache.spark.sql.SparkSession

/** Shared-storage seams for paths the engine writes outside the user's
  * own sinks (same deployment-seam pattern as [[Materialize]]: local
  * defaults for the single-JVM harness, one conf to point at real
  * shared storage on a cluster).
  *
  *  - `spark.graft.layout.root` — STABLE root for [[graft.operators
  *    .Layout]]'s bucketed/partitioned table rewrites (idempotent
  *    reuse requires the same path every call). Default: the JVM's
  *    tmpdir — correct for local[N], must be an HDFS/object-store URI
  *    on a cluster (executors and driver must all reach it).
  *  - `spark.graft.scratch.dir` — root for PER-RUN scratch (streaming
  *    checkpoints / foreachBatch staging, e.g. q56): each call gets a
  *    fresh unique subdirectory. Default: a local temp dir.
  */
object Scratch {

  /** Stable layout root (no per-call uniqueness — reuse is the point). */
  def layoutRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.layout.root")
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_layout")

  /** Fresh unique scratch dir under the configured root (or a local
    * temp dir when unconfigured). */
  def tempDir(spark: SparkSession, prefix: String): String =
    spark.conf.getOption("spark.graft.scratch.dir") match {
      case Some(root) =>
        s"$root/$prefix-${java.util.UUID.randomUUID()}"
      case None =>
        java.nio.file.Files.createTempDirectory(prefix).toString
    }

  /** Collision-proof tag for a key path: the sanitized form alone
    * would map e.g. sf0.1 / sf0_1 / sf0-1 to one name; an md5 suffix
    * of the RAW key disambiguates. */
  def pathTag(key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${key.replaceAll("[^A-Za-z0-9]", "_")}_$h"
  }

  /** STABLE engine-managed dir under [[layoutRoot]] for a (prefix,
    * key) pair: repeated runs overwrite the same path, so storage
    * stays bounded at one copy instead of accumulating per run. */
  def stableDir(spark: SparkSession, prefix: String, key: String): String =
    s"${layoutRoot(spark)}/$prefix-${pathTag(key)}"

  /** Recursive FILE listing as plain FileStatus (name, length, mtime).
    * Deliberately not `fs.listFiles(p, recursive = true)`: the
    * located-status iterator it returns resolves block locations per
    * file, which costs ~7 ms EACH on LocalFileSystem (measured 0.55 s
    * for a 74-file directory; a 10k-small-file table — exactly the
    * state compaction exists to fix — would pay ~70 s just listing).
    * A listStatus recursion reads the same fields at ~0.2 ms/file and
    * stays cluster-safe through the same FileSystem API. Returns empty
    * for a missing root; a FILE root yields itself. */
  def walkFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    if (!fs.exists(root)) return Nil
    val rootSt = fs.getFileStatus(root)
    if (!rootSt.isDirectory) return Seq(rootSt)
    val out =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val stack = scala.collection.mutable.Stack(root)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { s =>
        if (s.isDirectory) stack.push(s.getPath) else out += s
      }
    }
    out.toSeq
  }

  /** Read a small file fully, draining to EOF — a remote FS may
    * legally return a SHORT first read, and a one-read caller would
    * silently truncate (the validation-token bug class). One shared
    * body for every driver-side marker/token/digest read; throws on
    * IO failure — callers decide whether that's a fallback (markers)
    * or a conservative mismatch (digests). */
  def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream(4096)
      val bytes = new Array[Byte](4096)
      var n = in.read(bytes)
      while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
      buf.toByteArray
    } finally in.close()
  }

  /** Resolve a path string to its (FileSystem, Path) under the
    * session's Hadoop conf — the one way engine-side probes/deletes
    * touch storage. Hadoop FS, not java.io, because every
    * engine-managed dir (corpus, indexes, layouts, checkpoints) can
    * live on HDFS/object storage on a real cluster; java.io would
    * silently report "missing" for every non-local URI. */
  def fs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** CONTENT-CHANGE witness for a parquet table dir from ONE
    * driver-side listing — every current data file's (path, length,
    * mtime), sorted (r18; extracted from Similarity's corpus-count
    * cache so the seed-identity caches share one definition).
    * Generation-aware (only the files a reader would see). None when
    * the listing fails for any reason — callers must then fall back
    * to scanning, never guess. A table whose signature is unchanged
    * has byte-identical current files, so any pure function of its
    * content (count, fingerprint) can be reused without a Spark job;
    * an append/rewrite/compaction changes the signature and forces a
    * recompute. */
  def fileSignature(spark: SparkSession, path: String): Option[String] =
    try {
      val (f, p) = fs(spark, path)
      Some(graft.sources.Generations.walkCurrentFiles(f, p)
        .map(s => s"${s.getPath}|${s.getLen}|${s.getModificationTime}")
        .sorted.mkString("\n"))
    } catch { case scala.util.control.NonFatal(_) => None }
}
