package graft.api

import org.apache.spark.sql.DataFrame

import graft.checks.Validations.Method
import graft.sources.ParquetSink
import graft.sql.{Dialect, SqlSink, SqlServerDialect}
import graft.types.SqlTypeMapper.SqlType

/** Public API — the Spark-native equivalent of the reference's single
  * entry point `df_to_azure(...)` (reference export.py:20-62,
  * __init__.py:3; SURVEY.md §2 O1). One function, two routes:
  *
  *  - SQL route (`parquet = false`): [[graft.sql.SqlSink]] —
  *    create/append/staged-MERGE-upsert over JDBC;
  *  - storage route (`parquet = true`): [[graft.sources.ParquetSink]] —
  *    create/append/keyed-upsert over parquet directories.
  *
  * The reference's Azure control-plane knobs (create=..., pipeline_name,
  * wait_till_finished) have no Spark counterpart by design: the Spark
  * job IS the pipeline and runs synchronously (SURVEY.md §2 O18-O20).
  */
object Graft {

  /** Load `df` into a SQL table or parquet folder.
    *
    * @param method   "create" (DDL-replace target), "append", "upsert"
    * @param idField  key columns, required for upsert
    * @param parquet  true → parquet route (`target` is the base dir);
    *                 false → JDBC route (`target` is the JDBC URL)
    * @param singleFile parquet route only: reference-compatible
    *                 single-object layout (`schema/table.parquet` as ONE
    *                 file — see [[graft.sources.ParquetSink]])
    * @return true if data was written; false = empty-input no-op
    */
  def dfToTable(
      df: DataFrame,
      tablename: String,
      schema: String,
      target: String,
      method: String = "create",
      idField: Seq[String] = Nil,
      parquet: Boolean = false,
      textLength: Int = 255,
      decimalPrecision: Int = 2,
      dtypes: Map[String, SqlType] = Map.empty,
      cleanStaging: Boolean = true,
      dialect: Dialect = SqlServerDialect,
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None,
      singleFile: Boolean = false): Boolean = {
    val m = Method.parse(method)
    if (parquet)
      ParquetSink.write(df,
        ParquetSink.Config(target, tablename, schema, m, idField,
          singleFile = singleFile))
    else
      SqlSink.write(df, SqlSink.Config(target, tablename, schema, m,
        idField, textLength, decimalPrecision, dtypes, cleanStaging,
        dialect = dialect, batchSize = batchSize,
        numPartitions = numPartitions))
  }
}
