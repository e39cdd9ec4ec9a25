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
}
