package graft.sql

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.checks.Validations
import graft.checks.Validations.Method
import graft.types.SqlTypeMapper
import graft.types.SqlTypeMapper.SqlType

/** JDBC sink orchestration — the Spark-native form of the reference's
  * blob→ADF→SQL pipeline (SURVEY.md §3.1-3.2):
  *
  *  - **create** (O9/O12): CREATE SCHEMA if needed, DROP+CREATE the
  *    target with inferred column types (create *replaces* on every
  *    call, reference export.py:169), then a distributed JDBC append;
  *  - **append** (O13): distributed JDBC append, no DDL — the schema
  *    must already match, same trust as the reference;
  *  - **upsert** (O14): key-uniqueness assert, stage the frame into
  *    `staging.<table>` (DDL-replaced), run the generated MERGE text
  *    over one raw connection, then drop staging (`cleanStaging`).
  *
  * The ADF control plane (linked services, pipeline resources, 1 s
  * polling) collapses into this sequential driver code: the Spark write
  * IS the copy activity and runs synchronously. Bulk rows travel
  * executor→DB in parallel partitions (`numPartitions` × `batchsize`),
  * never through the driver.
  */
object SqlSink {

  final case class Config(
      url: String,
      table: String,
      schema: String,
      method: Method,
      idField: Seq[String] = Nil,
      textLength: Int = 255,
      decimalPrecision: Int = 2,
      dtypes: Map[String, SqlType] = Map.empty,
      cleanStaging: Boolean = true,
      stagingSchema: String = "staging",
      dialect: Dialect = SqlServerDialect,
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None)

  /** DDL text for CREATE TABLE from inferred types. */
  def createTableSql(df: DataFrame, cfg: Config, schema: String): String = {
    val types = SqlTypeMapper.inferColumnTypes(
      df, cfg.textLength, cfg.decimalPrecision, cfg.dtypes)
    val cols = types.map { case (name, t) =>
      s"${cfg.dialect.quote(name)} ${cfg.dialect.ddlType(t)}"
    }.mkString(", ")
    s"CREATE TABLE ${cfg.dialect.table(schema, cfg.table)} ($cols)"
  }

  private def replaceTable(df: DataFrame, cfg: Config, schema: String): Unit = {
    cfg.dialect.createSchemaSql(schema)
      .foreach(JdbcOps.executeIgnore(cfg.url, _))
    JdbcOps.executeIgnore(cfg.url, cfg.dialect.dropTableSql(schema, cfg.table))
    JdbcOps.execute(cfg.url, createTableSql(df, cfg, schema))
  }

  private def jdbcAppend(df: DataFrame, cfg: Config, schema: String): Unit = {
    val repart = cfg.numPartitions.map(df.repartition(_)).getOrElse(df)
    repart.write
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.dialect.table(schema, cfg.table))
      .option("batchsize", cfg.batchSize)
      .option("truncate", "false")
      .mode(SaveMode.Append)
      .save()
  }

  /** Entry point: validate, normalize, route on method. Returns true if
    * anything was written (false = empty-input short-circuit, O3). */
  def write(df: DataFrame, cfg: Config): Boolean = {
    Validations.requireUniqueColumnNames(df)
    Validations.requireIdField(cfg.method, cfg.idField)
    if (Validations.isEmpty(df)) return false
    val norm = SqlTypeMapper.normalizeIntervals(df)
    cfg.method match {
      case Method.Create =>
        replaceTable(norm, cfg, cfg.schema)
        jdbcAppend(norm, cfg, cfg.schema)
      case Method.Append =>
        jdbcAppend(norm, cfg, cfg.schema)
      case Method.Upsert =>
        Validations.requireUniqueKeys(norm, cfg.idField)
        replaceTable(norm, cfg, cfg.stagingSchema)
        jdbcAppend(norm, cfg, cfg.stagingSchema)
        val merge = MergeBuilder(cfg.table, cfg.schema, cfg.idField,
          norm.columns.toSeq, cfg.dialect, cfg.stagingSchema)
        JdbcOps.execute(cfg.url, merge.mergeStatement)
        if (cfg.cleanStaging)
          JdbcOps.executeIgnore(cfg.url,
            cfg.dialect.dropTableSql(cfg.stagingSchema, cfg.table))
    }
    true
  }
}
