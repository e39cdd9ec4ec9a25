package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.checks.UnknownDtypeError
import graft.checks.Validations.qcol

/** Spark schema → SQL Server column-type mapping with data-driven
  * refinement (SURVEY.md §1.2, §2 O4-O8).
  *
  * Reference semantics reproduced:
  *  - static map (reference export.py:218-250): string→VARCHAR(textLength),
  *    bool→BIT, any integer width→INT, float→NUMERIC(18, decimalPrecision),
  *    datetime→DATETIME, unknown→hard fail;
  *  - string width inference (export.py:252-267): observed max length in
  *    (255, 8000) → VARCHAR(len); > 8000 → VARCHAR(MAX);
  *  - BIGINT promotion (export.py:269-282): any observed value outside
  *    signed-32 range → BIGINT (declared width is ignored — only observed
  *    values matter, reference tests/test_general.py:96-115);
  *  - user dtype override merged last (export.py:160-163);
  *  - timedelta → float seconds BEFORE mapping (export.py:202-216) —
  *    ordering preserved by [[normalizeIntervals]].
  *
  * Scale note: both data scans (O6+O7) are fused into ONE aggregate job
  * ([[refine]]) — a single map-side-combinable pass over the input instead
  * of the reference's one pandas scan per column. At 100 TB that is one
  * parquet read with only the scanned columns in ReadSchema.
  */
object SqlTypeMapper {

  sealed trait SqlType { def ddl: String }
  /** length=None means VARCHAR(MAX) (reference export.py:262-263). */
  final case class SqlVarchar(length: Option[Int]) extends SqlType {
    def ddl: String = length match {
      case Some(n) => s"VARCHAR($n)"
      case None => "VARCHAR(MAX)"
    }
  }
  case object SqlBit extends SqlType { def ddl = "BIT" }
  case object SqlInt extends SqlType { def ddl = "INT" }
  case object SqlBigInt extends SqlType { def ddl = "BIGINT" }
  final case class SqlNumeric(precision: Int, scale: Int) extends SqlType {
    def ddl: String = s"NUMERIC($precision,$scale)"
  }
  case object SqlDateTime extends SqlType { def ddl = "DATETIME" }
  case object SqlDate extends SqlType { def ddl = "DATE" }

  /** Timedelta normalization (O4): interval columns become float seconds,
    * exactly like the reference's pre-mapping mutate, but immutably. */
  def normalizeIntervals(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: DayTimeIntervalType =>
          // TWO casts, and the first is load-bearing: interval →
          // numeric counts the interval's END-field units, not seconds
          // — a DAY-endField interval (what `end_date - start_date`
          // produces) would cast 3 days to 3.0, an 86400× silent
          // mis-scale vs the reference's total_seconds(). Widening to
          // DAY TO SECOND first is lossless (same 64-bit micros
          // payload, endField SECOND), so the numeric cast then yields
          // seconds with fractional micros for EVERY start/end
          // combination. (decimal, not long: long truncates the
          // fraction.)
          acc.withColumn(f.name,
            qcol(f.name).cast(DayTimeIntervalType(DayTimeIntervalType.DAY,
                DayTimeIntervalType.SECOND))
              .cast(DecimalType(24, 6)).cast(DoubleType))
        case _ => acc
      }
    }

  /** Static dtype map (O5). Call on the interval-normalized frame. */
  def staticType(dt: DataType, textLength: Int, decimalPrecision: Int): SqlType =
    dt match {
      case StringType => SqlVarchar(Some(textLength))
      case BooleanType => SqlBit
      case ByteType | ShortType | IntegerType | LongType => SqlInt
      case FloatType | DoubleType => SqlNumeric(18, decimalPrecision)
      case d: DecimalType => SqlNumeric(d.precision, d.scale)
      case TimestampType | TimestampNTZType => SqlDateTime
      case DateType => SqlDate
      case other =>
        throw UnknownDtypeError(s"Unknown dtype for SQL mapping: $other")
    }

  /** Fused O6+O7 data scan: per string column the observed max length,
    * per integer column the observed min/max — one aggregate pass. */
  def refine(df: DataFrame, base: Map[String, SqlType]): Map[String, SqlType] = {
    val strCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSeq
    val intCols = df.schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType) => f.name
    }.toSeq
    if (strCols.isEmpty && intCols.isEmpty) return base

    val aggs: Seq[Column] =
      strCols.map(c => max(length(qcol(c))).as(s"__len__$c")) ++
      intCols.flatMap(c => Seq(
        min(qcol(c)).cast(LongType).as(s"__min__$c"),
        max(qcol(c)).cast(LongType).as(s"__max__$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val widened = strCols.flatMap { c =>
      val len = Option(row.getAs[Any](s"__len__$c"))
        .map(_.asInstanceOf[Number].intValue).getOrElse(0)
      // Reference thresholds are literal 255/8000 (export.py:258-263).
      if (len > 8000) Some(c -> SqlVarchar(None))
      else if (len > 255) Some(c -> SqlVarchar(Some(len)))
      else None
    }.toMap
    val promoted = intCols.flatMap { c =>
      val lo = if (row.isNullAt(row.fieldIndex(s"__min__$c"))) 0L
        else row.getAs[Long](s"__min__$c")
      val hi = if (row.isNullAt(row.fieldIndex(s"__max__$c"))) 0L
        else row.getAs[Long](s"__max__$c")
      if (lo < Int.MinValue.toLong || hi > Int.MaxValue.toLong) Some(c -> SqlBigInt)
      else None
    }.toMap
    // Later update wins, same order as the reference (export.py:156-163).
    base ++ widened ++ promoted
  }

  /** Full inference pipeline: intervals → static map → data refinement →
    * user overrides (last wins). Returns types in df column order. */
  def inferColumnTypes(
      df: DataFrame,
      textLength: Int = 255,
      decimalPrecision: Int = 2,
      overrides: Map[String, SqlType] = Map.empty): Seq[(String, SqlType)] = {
    val norm = normalizeIntervals(df)
    val static = norm.schema.fields.map { f =>
      f.name -> staticType(f.dataType, textLength, decimalPrecision)
    }.toMap
    val refined = refine(norm, static) ++ overrides
    norm.columns.toSeq.map(c => c -> refined(c))
  }
}
