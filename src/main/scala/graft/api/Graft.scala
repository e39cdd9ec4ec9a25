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
    * Route-specific knobs, stated rather than silently shared (the
    * reference accepts every knob on both routes and drops the
    * inapplicable ones on the floor — here the SQL-only knobs at
    * their DEFAULTS are simply unused by the parquet route, and
    * passing a NON-default SQL-only knob with `parquet = true` is
    * refused loudly; same in reverse for the parquet-only knobs):
    *
    *  - SQL route only: `textLength`, `decimalPrecision`, `dtypes`,
    *    `cleanStaging`, `dialect`, `batchSize`, `numPartitions`,
    *    `stagingSchema`, `exactlyOnce`;
    *  - parquet route only: `singleFile`, `partitionBy` (hive layout —
    *    the partition-pruning lever at 100 TB; incompatible with
    *    `singleFile`).
    *
    * @param method   "create" (DDL-replace target), "append", "upsert"
    * @param idField  key columns, required for upsert
    * @param parquet  true → parquet route (`target` is the base dir);
    *                 false → JDBC route (`target` is the JDBC URL)
    * @param singleFile parquet route only: reference-compatible
    *                 single-object layout (`schema/table.parquet` as ONE
    *                 file — see [[graft.sources.ParquetSink]])
    * @param partitionBy parquet route only: hive partition columns
    * @param stagingSchema SQL route only: schema of the upsert /
    *                 exactly-once staging tables (must differ from
    *                 `schema` under upsert)
    * @param exactlyOnce SQL route only: route create/append loads
    *                 through the staged exactly-once path (see
    *                 [[graft.sql.SqlSink.Config]])
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
      singleFile: Boolean = false,
      partitionBy: Seq[String] = Nil,
      stagingSchema: String = "staging",
      exactlyOnce: Boolean = false): Boolean = {
    val m = Method.parse(method)
    if (parquet) {
      val sqlOnly = Seq(
        (textLength != 255) -> "textLength",
        (decimalPrecision != 2) -> "decimalPrecision",
        dtypes.nonEmpty -> "dtypes",
        !cleanStaging -> "cleanStaging",
        (dialect != SqlServerDialect) -> "dialect",
        (batchSize != 10000) -> "batchSize",
        numPartitions.nonEmpty -> "numPartitions",
        (stagingSchema != "staging") -> "stagingSchema",
        exactlyOnce -> "exactlyOnce").collect { case (true, n) => n }
      require(sqlOnly.isEmpty,
        s"parquet route ignores SQL-only knobs — remove: " +
          sqlOnly.mkString(", "))
      ParquetSink.write(df,
        ParquetSink.Config(target, tablename, schema, m, idField,
          singleFile = singleFile, partitionBy = partitionBy))
    } else {
      val pqOnly = Seq(
        singleFile -> "singleFile",
        partitionBy.nonEmpty -> "partitionBy").collect {
        case (true, n) => n
      }
      require(pqOnly.isEmpty,
        s"SQL route ignores parquet-only knobs — remove: " +
          pqOnly.mkString(", "))
      // same refuse-loudly contract as the route-only knobs above:
      // SqlSink consults exactlyOnceAppend only on the create/append
      // branches — upsert is already retry-safe via its (pid, attempt)-
      // tagged staging + MERGE, so the knob would be a silent no-op
      require(!exactlyOnce || m != Method.Upsert,
        "exactlyOnce applies to create/append only — upsert is " +
          "already exactly-once via its staged MERGE; remove the knob")
      SqlSink.write(df, SqlSink.Config(target, tablename, schema, m,
        idField, textLength, decimalPrecision, dtypes, cleanStaging,
        stagingSchema = stagingSchema, dialect = dialect,
        batchSize = batchSize, numPartitions = numPartitions,
        exactlyOnceAppend = exactlyOnce))
    }
  }
}
