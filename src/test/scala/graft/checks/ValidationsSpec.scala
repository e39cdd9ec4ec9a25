package graft.checks

import graft.SparkSpec
import graft.checks.Validations.Method

/** Reference behavior: method whitelist (settings.py:27-30), upsert
  * requires id_field (settings.py:31-34), duplicate column names
  * rejected (utils.py:92-97), duplicate keys rejected under upsert
  * (utils.py:87-89, tests/test_upsert.py:113-134). */
class ValidationsSpec extends SparkSpec {

  import spark.implicits._

  test("method parse accepts exactly create/append/upsert") {
    assert(Method.parse("create") === Method.Create)
    assert(Method.parse("append") === Method.Append)
    assert(Method.parse("upsert") === Method.Upsert)
    assertThrows[IllegalArgumentException](Method.parse("merge"))
  }

  test("upsert without id field is rejected") {
    assertThrows[IllegalArgumentException] {
      Validations.requireIdField(Method.Upsert, Nil)
    }
    Validations.requireIdField(Method.Create, Nil) // fine
  }

  test("duplicate column names are rejected") {
    val df = Seq((1, 2)).toDF("a", "b").select($"a", $"b".as("a"))
    assertThrows[DoubleColumnNamesError] {
      Validations.requireUniqueColumnNames(df)
    }
  }

  test("duplicate keys are rejected under upsert") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("id", "v")
    assertThrows[UpsertError] {
      Validations.requireUniqueKeys(df, Seq("id"))
    }
    Validations.requireUniqueKeys(df.filter($"v" =!= "y"), Seq("id"))
  }

  test("empty-input probe") {
    assert(Validations.isEmpty(Seq.empty[(Int, Int)].toDF("a", "b")))
    assert(!Validations.isEmpty(Seq((1, 2)).toDF("a", "b")))
  }
}
