package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion shim for parquet written by pandas.
  *
  * Parquet has no duration/timedelta logical type, so pandas stores a
  * `timedelta64` column as PLAIN INT64 and records the real type only
  * in footer key-value metadata (the `pandas` JSON block, alongside
  * `ARROW:schema`). A naive `spark.read.parquet` therefore surfaces
  * LongType, and the type mapper would declare INT where the reference
  * produces NUMERIC seconds (export.py:202-216 converts timedelta via
  * `.dt.total_seconds()` before mapping) — the reference's native input
  * format would round-trip wrong.
  *
  * [[read]] closes that gap: it reads ONE part-file footer (metadata
  * only — no data pages touched, so cost is independent of table
  * size), finds `timedelta64[unit]` columns in the pandas metadata,
  * and rewrites them to float seconds exactly like pandas
  * `total_seconds()` does (value / unit-scale in double). Downstream,
  * [[graft.types.SqlTypeMapper]] then sees DoubleType → NUMERIC.
  */
object PandasParquet {

  private val unitScale: Map[String, Double] = Map(
    "ns" -> 1e9, "us" -> 1e6, "ms" -> 1e3, "s" -> 1.0)

  /** Read a parquet path, converting pandas timedelta columns to float
    * seconds (the reference's pre-mapping normal form). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    timedeltaColumns(spark, path).foldLeft(df) { case (acc, (name, scale)) =>
      // qcol: a pandas column may legally be named "elapsed.time" —
      // a bare col() would parse the dot as struct-field access
      acc.withColumn(name,
        graft.checks.Validations.qcol(name).cast("double") / lit(scale))
    }
  }

  /** (column, unit-scale) for every `timedelta64[...]` column declared
    * in the pandas footer metadata; empty for non-pandas files. */
  def timedeltaColumns(spark: SparkSession, path: String): Seq[(String, Double)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    val file =
      if (status.isFile) p
      else {
        // RECURSIVE part-file search: pandas to_parquet(partition_cols=
        // [...]) nests parts under key=val subdirectories, where a
        // top-level-only listing finds nothing and this shim would
        // silently skip the conversion — the exact raw-INT64-nanos
        // round-trip it exists to prevent. listFiles(recursive) walks
        // the directory tree; the first part's footer carries the same
        // pandas metadata block as every other.
        val it = fs.listFiles(p, true)
        var found: Option[Path] = None
        while (found.isEmpty && it.hasNext) {
          val s = it.next()
          val n = s.getPath.getName
          if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
              !n.startsWith("."))
            found = Some(s.getPath)
        }
        found.getOrElse(return Nil)
      }
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      Option(kv.get("pandas")).toSeq.flatMap(parsePandasColumns)
    } finally reader.close()
  }

  /** Pull (name, scale) pairs out of the pandas metadata JSON. */
  private[sources] def parsePandasColumns(json: String): Seq[(String, Double)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val td = "timedelta64\\[(\\w+)\\]".r
    JsonMethods.parseOpt(json).toSeq.flatMap { root =>
      (root \ "columns") match {
        case JArray(cols) => cols.flatMap { c =>
          (c \ "name", c \ "numpy_type") match {
            case (JString(name), JString(td(unit))) =>
              unitScale.get(unit).map(name -> _)
            case (JString(name), JString("timedelta64")) =>
              Some(name -> 1e9) // bare dtype: pandas default is ns
            case _ => None
          }
        }
        case _ => Nil
      }
    }
  }
}
