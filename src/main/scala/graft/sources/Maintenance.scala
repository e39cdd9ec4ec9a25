package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance: small-file compaction. Long-running append
  * pipelines accumulate part files until scan planning and footer reads
  * dominate; compaction rewrites the directory to ~`targetRowsPerFile`
  * rows per file through a shadow directory + recoverable swap (same
  * pattern as the upsert sink — a crash at any instant leaves a
  * complete copy of the table on disk, live or at `<path>__old`).
  */
object Maintenance {

  /** @return (files before, files after) */
  def compact(spark: SparkSession, path: String,
      targetRowsPerFile: Long): (Int, Int) = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles(): Int =
      fs.globStatus(new Path(path + "/*.parquet")).length
    val before = parquetFiles()
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val shadow = new Path(path + "__compact")
    df.repartition(files).write.mode(SaveMode.Overwrite)
      .parquet(shadow.toString)
    ParquetSink.swapInto(fs, shadow, new Path(path))
    (before, parquetFiles())
  }

  /** Compact the incremental-ingest dedup indexes (`<corpusDir>__sh`,
    * `<corpusDir>__bands` — [[graft.streaming.StreamOps
    * .incrementalIngestStream]]'s state) back into exact lockstep with
    * the committed corpus. The streaming sink tolerates index debris
    * by construction — crash-replay leaves ORPHANED rows (doc in the
    * index, never committed) and DUPLICATE rows (re-appended on
    * replay), both made harmless at read time by the sink's
    * committed-doc_ids visibility filter and the candidate join's
    * distinct. But debris still costs scan IO forever; a standing
    * pipeline runs this periodically (alongside [[compact]], which
    * handles the small-files axis) to stop unbounded growth.
    *
    * Each index rewrites through a shadow dir + recoverable swap, so a
    * crash mid-compaction leaves a complete copy live or at `__old` —
    * and the sink's visibility filter means even a torn state (one
    * index compacted, the other not) stays correct.
    *
    * @return (sh rows dropped, band rows dropped) */
  def compactIngestIndexes(spark: SparkSession, corpusDir: String)
      : (Long, Long) = {
    import org.apache.spark.sql.DataFrame
    val committed = spark.read.parquet(corpusDir).select("doc_id")
    def rewrite(dir: String, clean: DataFrame => DataFrame): Long = {
      val df = spark.read.parquet(dir)
      val before = df.count()
      val kept = clean(df.join(committed, Seq("doc_id"), "left_semi"))
      val shadow = new Path(dir + "__compact")
      val fs = shadow.getFileSystem(spark.sparkContext.hadoopConfiguration)
      kept.write.mode(SaveMode.Overwrite).parquet(shadow.toString)
      // count the written shadow, not `kept` — one pass over the data
      val after = spark.read.parquet(shadow.toString).count()
      ParquetSink.swapInto(fs, shadow, new Path(dir))
      before - after
    }
    // one shingle-set row per doc; band rows are deterministic
    // (doc_id, band, sig) triples, so exact distinct dedupes replays
    val shDropped = rewrite(corpusDir + "__sh",
      _.dropDuplicates("doc_id"))
    val bandsDropped = rewrite(corpusDir + "__bands", _.distinct())
    (shDropped, bandsDropped)
  }
}
