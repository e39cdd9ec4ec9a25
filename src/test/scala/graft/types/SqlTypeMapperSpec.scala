package graft.types

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.checks.UnknownDtypeError
import graft.types.SqlTypeMapper._

/** Port of the reference's dtype→SQL golden matrix
  * (reference tests/test_general.py:41-133, 136-147, 201-220):
  * strings→varchar(255), any int width→int, float→numeric(18,2),
  * datetime→datetime, bool→bit; width inference >255/>8000; bigint
  * promotion by observed value only. */
class SqlTypeMapperSpec extends SparkSpec {

  import spark.implicits._

  test("static matrix: string/bool/int/long/float/double/timestamp/date") {
    val df = Seq((1, 2L, 1.5f, 2.5, true, "x"))
      .toDF("i", "l", "f", "d", "b", "s")
      .withColumn("ts", lit(Timestamp.valueOf("2024-01-02 03:04:05")))
      .withColumn("dt", lit(java.sql.Date.valueOf("2024-01-02")))
    val types = SqlTypeMapper.inferColumnTypes(df).toMap
    assert(types("s") === SqlVarchar(Some(255)))
    assert(types("b") === SqlBit)
    assert(types("i") === SqlInt)
    // Declared LongType with small values still maps to INT — only
    // observed values promote (reference tests/test_general.py:96-115).
    assert(types("l") === SqlInt)
    assert(types("f") === SqlNumeric(18, 2))
    assert(types("d") === SqlNumeric(18, 2))
    assert(types("ts") === SqlDateTime)
    assert(types("dt") === SqlDate)
  }

  test("string width inference: >255 exact, >8000 becomes VARCHAR(MAX)") {
    val df = Seq(
      ("a" * 10, "b" * 300, "c" * 10000)).toDF("small", "mid", "huge")
    val types = SqlTypeMapper.inferColumnTypes(df).toMap
    assert(types("small") === SqlVarchar(Some(255)))
    assert(types("mid") === SqlVarchar(Some(300)))
    assert(types("huge") === SqlVarchar(None))
    assert(SqlVarchar(None).ddl === "VARCHAR(MAX)")
  }

  test("bigint promotion on value outside signed-32 range, either sign") {
    val df = Seq((-2147483649L, 100L), (5L, 2147483648L), (1L, 0L))
      .toDF("neg", "pos")
    val types = SqlTypeMapper.inferColumnTypes(df).toMap
    assert(types("neg") === SqlBigInt)
    assert(types("pos") === SqlBigInt)
  }

  test("user dtype override wins last (reference export.py:160-163)") {
    val df = Seq(("2024-01-02", 1)).toDF("d", "i")
    val types = SqlTypeMapper.inferColumnTypes(
      df, overrides = Map("d" -> SqlDate)).toMap
    assert(types("d") === SqlDate)
    assert(types("i") === SqlInt)
  }

  test("interval columns become float seconds before mapping (O4)") {
    val df = Seq(Tuple1(Duration.ofSeconds(93784))).toDF("td")
    val norm = SqlTypeMapper.normalizeIntervals(df)
    assert(norm.schema("td").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(norm.head().getDouble(0) === 93784.0)
    val types = SqlTypeMapper.inferColumnTypes(df).toMap
    assert(types("td") === SqlNumeric(18, 2))
  }

  test("non-SECOND-endField intervals still normalize to SECONDS") {
    // interval → numeric counts END-field units: a DAY-endField
    // interval (what `end_date - start_date` produces) would cast
    // 3 days to 3.0 — an 86400× silent mis-scale vs the reference's
    // total_seconds() — without the lossless widening to DAY TO SECOND
    // that normalizeIntervals performs first
    val df = spark.sql(
      "SELECT DATE'2020-01-04' - DATE'2020-01-01' AS d_days, " +
        "INTERVAL '2' HOUR AS d_hours, " +
        "INTERVAL '1 02:03:04.5' DAY TO SECOND AS d_full")
    val norm = SqlTypeMapper.normalizeIntervals(df).head()
    assert(norm.getDouble(0) === 259200.0) // 3 days
    assert(norm.getDouble(1) === 7200.0) // 2 hours
    assert(norm.getDouble(2) === 93784.5)
  }

  test("unknown dtype fails hard (reference export.py:243-244)") {
    val df = Seq(Tuple1(Seq(1, 2))).toDF("arr")
    assertThrows[UnknownDtypeError] {
      SqlTypeMapper.inferColumnTypes(df)
    }
  }

  test("decimal precision knob flows into NUMERIC scale") {
    val df = Seq(Tuple1(1.5)).toDF("d")
    val types = SqlTypeMapper.inferColumnTypes(df, decimalPrecision = 4).toMap
    assert(types("d") === SqlNumeric(18, 4))
    assert(SqlNumeric(18, 4).ddl === "NUMERIC(18,4)")
  }
}
