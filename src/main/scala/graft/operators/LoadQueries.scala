package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.types.SqlTypeMapper

/** Driver-checkable query forms of the reference's load-path operators
  * (SURVEY.md §2 O5-O8, O13, O15). Each derives a deterministic old/new
  * frame pair from the `orders` table so the DuckDB oracle can rebuild
  * the identical inputs from the same parquet.
  */
object LoadQueries {

  private val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  /** "Existing" frame: 3/4 of orders. */
  private def oldFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 4 =!= 3)
      .select(cols.map(col): _*)

  /** "Delta" frame: even keys, price bumped, status nulled on every 8th
    * key (exercises both the coalesce fill and the null-dispatch). */
  private def newFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        when(col("o_orderkey") % 8 === 0, lit(null: String))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"))

  /** O15 cell-level branch (pandas combine_first). */
  def q15UpsertCells(spark: SparkSession, sfDir: String): DataFrame =
    Upsert.combineFirst(newFrame(spark, sfDir), oldFrame(spark, sfDir),
        Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))

  /** O15 dispatch: the delta has nulls → row-level branch. Also the exact
    * result set of the SQL-path MERGE (O14): matched rows fully updated,
    * unmatched source inserted, target-only rows untouched. */
  def q16UpsertRows(spark: SparkSession, sfDir: String): DataFrame =
    Upsert.upsert(newFrame(spark, sfDir), oldFrame(spark, sfDir),
      Seq("o_orderkey"))

  /** O13/O17 append semantics: plain multiset union. o_orderstatus is
    * nullable here (the delta nulls every 8th key) and appears UNDER a
    * duplicated sort prefix (old+new rows share o_orderkey), so its
    * null position is result-order-bearing: Spark's ASC default is
    * NULLS FIRST while DuckDB's is NULLS LAST — both sides must spell
    * it out or the deterministic-order contract silently breaks. */
  def q17Append(spark: SparkSession, sfDir: String): DataFrame =
    Upsert.append(newFrame(spark, sfDir), oldFrame(spark, sfDir))
      .orderBy(col("o_orderkey"), col("o_orderstatus").asc_nulls_first,
        col("o_totalprice"))

  /** O5-O8 schema inference exposed as a query: (col_name, sql_type) for
    * a frame with a wide string (documents.text > 255 chars), a value
    * range crossing the signed-32 boundary (bigint promotion), a double
    * (NUMERIC default) and a boolean (BIT). */
  def q18SchemaInfer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        col("text"),
        (col("n_chars") * 10000000L).as("big_id"),
        (col("n_chars").cast("double") / 7).as("score"),
        (col("n_chars") > 300).as("is_long"))
    SqlTypeMapper.inferColumnTypes(d)
      .map { case (name, t) => (name, t.ddl) }
      .toDF("col_name", "sql_type")
      .orderBy(col("col_name"))
  }
}
