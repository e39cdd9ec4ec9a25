package graft.sql

/** SQL dialect abstraction so the sink is testable hermetically: the
  * production target is SQL Server (the reference's only SQL sink), the
  * test target is embedded Derby (in /opt/spark/jars). Only the handful
  * of differences the sink touches are abstracted.
  */
sealed trait Dialect {
  /** Identifier quoting. SQL Server brackets ([col a], reference
    * db.py:21-31 — preserves spaces in names, SURVEY.md §7.4 trap 4). */
  def quote(ident: String): String
  /** Qualified table name. */
  def table(schema: String, name: String): String =
    s"${quote(schema)}.${quote(name)}"
  /** MERGE "no match on target" clause keyword. */
  def notMatchedClause: String
  /** Left-hand side of a MERGE UPDATE SET assignment. SQL Server allows
    * (and the reference emits) the target-qualified form `t.[c]`;
    * Derby requires the unqualified column name. */
  def setLhs(quotedIdent: String): String = s"t.$quotedIdent"
  /** Idempotent CREATE SCHEMA statement(s). */
  def createSchemaSql(schema: String): Seq[String]
  /** DROP TABLE IF EXISTS equivalent (Derby has no IF EXISTS). */
  def dropTableSql(schema: String, name: String): String
  /** Map a generic DDL type to this dialect (VARCHAR(MAX) is MSSQL-only). */
  def ddlType(t: graft.types.SqlTypeMapper.SqlType): String
}

/** Azure SQL / SQL Server — the reference's target engine. */
case object SqlServerDialect extends Dialect {
  def quote(ident: String): String = s"[${ident.strip()}]"
  def notMatchedClause: String = "WHEN NOT MATCHED BY TARGET"
  def createSchemaSql(schema: String): Seq[String] = Seq(
    // Same idempotent statement the reference issues (export.py:195-200).
    s"IF NOT EXISTS (SELECT * FROM sys.schemas WHERE name = '$schema') " +
      s"EXEC('CREATE SCHEMA [$schema]')")
  def dropTableSql(schema: String, name: String): String =
    s"DROP TABLE IF EXISTS ${table(schema, name)}"
  def ddlType(t: graft.types.SqlTypeMapper.SqlType): String = t.ddl
}

/** Embedded Apache Derby — hermetic stand-in for integration tests. */
case object DerbyDialect extends Dialect {
  def quote(ident: String): String = "\"" + ident.strip() + "\""
  def notMatchedClause: String = "WHEN NOT MATCHED"
  override def setLhs(quotedIdent: String): String = quotedIdent
  def createSchemaSql(schema: String): Seq[String] =
    Seq(s"CREATE SCHEMA ${quote(schema)}")
  def dropTableSql(schema: String, name: String): String =
    s"DROP TABLE ${table(schema, name)}"
  def ddlType(t: graft.types.SqlTypeMapper.SqlType): String = {
    import graft.types.SqlTypeMapper._
    t match {
      case SqlVarchar(None) => "VARCHAR(32672)" // Derby has no VARCHAR(MAX)
      case SqlBit => "BOOLEAN"
      case SqlDateTime => "TIMESTAMP"
      case other => other.ddl
    }
  }
}
