package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load method ADT + precondition checks.
  *
  * Reference behavior (SURVEY.md §2 O2/O3):
  *  - method must be one of create/append/upsert
  *    (reference settings.py:27-30);
  *  - upsert requires a non-empty id_field (settings.py:31-34);
  *  - duplicate column names are rejected (utils.py:92-97,
  *    DoubleColumnNamesError);
  *  - under upsert the key columns must be row-unique (utils.py:87-89) —
  *    here a distributed groupBy-count instead of a pandas duplicated()
  *    scan, so the check works at 100 TB (one shuffle on the keys, which
  *    the subsequent MERGE/join needed anyway).
  */
object Validations {

  /** `col()` with the name backtick-quoted (backticks doubled): a
    * plain `col("a.b")` parses the dot as nested-field access, so a
    * literal column named "a.b" either throws or — worse, when a
    * struct column "a" with field "b" coexists — silently resolves to
    * the WRONG column. Every helper here and in the sinks that turns
    * a user-supplied column NAME into a Column goes through this. */
  def qcol(name: String): org.apache.spark.sql.Column =
    col("`" + name.replace("`", "``") + "`")

  sealed abstract class Method(val name: String)
  object Method {
    case object Create extends Method("create")
    case object Append extends Method("append")
    case object Upsert extends Method("upsert")
    def parse(s: String): Method = s match {
      case "create" => Create
      case "append" => Append
      case "upsert" => Upsert
      case other =>
        throw new IllegalArgumentException(
          s"method should be either create, append or upsert, got: $other")
    }
  }

  def requireIdField(method: Method, idField: Seq[String]): Unit =
    if (method == Method.Upsert && idField.isEmpty)
      throw new IllegalArgumentException(
        "Id field is required when method is upsert")

  def requireUniqueColumnNames(df: DataFrame): Unit = {
    val dupes = df.columns.groupBy(identity).collect {
      case (name, occ) if occ.length > 1 => name
    }
    if (dupes.nonEmpty)
      throw DoubleColumnNamesError(
        s"Columns have duplicate names: ${dupes.mkString(", ")}")
  }

  /** Distributed key-uniqueness assert (reference utils.py:87-89). */
  def requireUniqueKeys(df: DataFrame, keys: Seq[String]): Unit = {
    val dup = df.groupBy(keys.map(qcol): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .limit(1)
      .collect()
    if (dup.nonEmpty)
      throw UpsertError(
        s"Key columns ${keys.mkString(", ")} contain duplicate rows " +
          s"(e.g. ${dup.head.toSeq.init.mkString("/")}) — upsert requires unique keys")
  }

  /** Empty-input short-circuit (reference export.py:96-99): a cheap
    * take(1) probe, not a count over the whole input. */
  def isEmpty(df: DataFrame): Boolean = df.isEmpty
}
