package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.checks.Validations
import graft.checks.Validations.Method
import graft.operators.Upsert

/** Parquet sink — the reference's pure-storage path (SURVEY.md §3.3,
  * O11/O15/O16/O17). Layout: `<base>/<schema>/<table>.parquet` as a
  * directory of part files (the distributed replacement for the
  * reference's single blob object; readers glob the directory).
  *
  *  - **create**: overwrite the directory;
  *  - **append**: land additional part files (the reference's
  *    timestamp-suffixed per-call file becomes Spark's unique part
  *    files — same contract: never rewrites existing data);
  *  - **upsert**: read existing, apply [[Upsert.upsert]] (the
  *    reference's two-branch combine_first/row-replace semantics),
  *    write to a shadow directory, then atomically swap — never
  *    overwrite a directory that is still an input to the running job.
  */
object ParquetSink {

  /** @param partitionBy hive-style partition columns — at 100 TB a
    *   date/tenant partition layout is what makes downstream scans
    *   prune whole directories (PartitionFilters in the plan). */
  final case class Config(
      base: String,
      table: String,
      schema: String,
      method: Method,
      idField: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil)

  def tablePath(cfg: Config): String =
    s"${cfg.base}/${cfg.schema}/${cfg.table}.parquet"

  def write(df: DataFrame, cfg: Config): Boolean = {
    Validations.requireUniqueColumnNames(df)
    Validations.requireIdField(cfg.method, cfg.idField)
    if (Validations.isEmpty(df)) return false
    val spark = df.sparkSession
    val path = tablePath(cfg)
    def writer(d: org.apache.spark.sql.DataFrame, mode: SaveMode) = {
      val w = d.write.mode(mode)
      (if (cfg.partitionBy.nonEmpty) w.partitionBy(cfg.partitionBy: _*) else w)
    }
    cfg.method match {
      case Method.Create =>
        writer(df, SaveMode.Overwrite).parquet(path)
      case Method.Append =>
        writer(df, SaveMode.Append).parquet(path)
      case Method.Upsert =>
        Validations.requireUniqueKeys(df, cfg.idField)
        val fs = new Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new Path(path))) {
          writer(df, SaveMode.Overwrite).parquet(path)
        } else {
          val old = spark.read.parquet(path)
          val merged = Upsert.upsert(df, old, cfg.idField)
          val shadow = new Path(path + "__swap")
          writer(merged, SaveMode.Overwrite).parquet(shadow.toString)
          fs.delete(new Path(path), true)
          fs.rename(shadow, new Path(path))
        }
    }
    true
  }
}
