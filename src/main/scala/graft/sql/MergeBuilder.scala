package graft.sql

/** MERGE statement synthesis — the reference's flagship "join" operator
  * (SURVEY.md §2 O14; reference db.py:13-53).
  *
  * Semantics reproduced exactly (reference db.py:38-50, golden behavior
  * tests/test_upsert.py:17-48):
  *  - match on the conjunction of all id columns;
  *  - WHEN MATCHED → UPDATE every non-id column from the source;
  *  - WHEN NOT MATCHED [BY TARGET] → INSERT all columns;
  *  - no WHEN NOT MATCHED BY SOURCE clause — upsert never deletes.
  *
  * Differences from the reference, by design (SURVEY.md §3.2): the
  * stored-procedure wrapper (CREATE PROCEDURE [UPSERT_t]) exists only
  * because ADF needs a named activity; Spark executes the MERGE text
  * directly over one JDBC connection, so we emit the bare MERGE.
  * Column-name whitespace is stripped like db.py:18.
  */
final case class MergeBuilder(
    table: String,
    schema: String,
    idCols: Seq[String],
    columns: Seq[String],
    dialect: Dialect = SqlServerDialect,
    stagingSchema: String = "staging") {

  private val cols = columns.map(_.strip())
  private val keys = idCols.map(_.strip())

  def onClause: String =
    keys.map(k => s"s.${dialect.quote(k)} = t.${dialect.quote(k)}")
      .mkString(" AND ")

  def updateClause: String =
    cols.filterNot(keys.contains)
      .map(c => s"${dialect.setLhs(dialect.quote(c))} = s.${dialect.quote(c)}")
      .mkString(", ")

  def insertColumns: String = cols.map(dialect.quote).mkString("(", ", ", ")")

  def insertValues: String =
    cols.map(c => s"s.${dialect.quote(c)}").mkString("(", ", ", ")")

  /** The executable MERGE statement (no stored-procedure wrapper). */
  def mergeStatement: String = {
    val update =
      if (updateClause.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $updateClause "
      else ""
    s"MERGE INTO ${dialect.table(schema, table)} t " +
      s"USING ${dialect.table(stagingSchema, table)} s " +
      s"ON $onClause " + update +
      s"${dialect.notMatchedClause} THEN INSERT $insertColumns " +
      s"VALUES $insertValues${dialect.statementTerminator}"
  }
}
