package graft.operators

import graft.SparkSpec
import graft.checks.UpsertError

/** O15 semantics goldens — ports of reference tests/test_parquet.py
  * (94-157) and tests/test_upsert.py:17-48. The NaN-branch golden is
  * the subtle one: a missing value in the NEW frame switches the whole
  * upsert to row-replacement, so the missing cell SURVIVES instead of
  * being filled from the old frame. */
class UpsertSpec extends SparkSpec {

  import spark.implicits._

  private def old3 = Seq(
    (1, "A", "AA"), (2, "B", "BB"), (3, "C", "CC")).toDF("id", "x", "y")

  test("combineFirst: cell-level — new wins unless missing, row union") {
    val neu = Seq((2, "X", "XX"), (3, "Y", null.asInstanceOf[String]),
      (4, "Z", "ZZ")).toDF("id", "x", "y")
    val got = Upsert.combineFirst(neu, old3, Seq("id"))
      .orderBy("id").as[(Int, String, String)].collect().toSeq
    assert(got === Seq(
      (1, "A", "AA"),   // old-only row survives
      (2, "X", "XX"),   // fully replaced
      (3, "Y", "CC"),   // null cell filled from old — combine_first
      (4, "Z", "ZZ")))  // new-only row inserted
  }

  test("dispatch golden: null in new frame → row-replace, null survives" +
    " (reference tests/test_parquet.py:120-157)") {
    val neu = Seq((2, "X", "XX"), (3, "Y", null.asInstanceOf[String]))
      .toDF("id", "x", "y")
    val got = Upsert.upsert(neu, old3, Seq("id"))
      .orderBy("id").as[(Int, String, String)].collect().toSeq
    assert(got === Seq((1, "A", "AA"), (2, "X", "XX"), (3, "Y", null)))
  }

  test("dispatch: clean new frame → cell-level branch (same result set)") {
    val neu = Seq((3, "Y", "YY"), (5, "E", "EE")).toDF("id", "x", "y")
    val got = Upsert.upsert(neu, old3, Seq("id"))
      .orderBy("id").as[(Int, String, String)].collect().toSeq
    assert(got === Seq((1, "A", "AA"), (2, "B", "BB"), (3, "Y", "YY"),
      (5, "E", "EE")))
  }

  test("NaN in a double column counts as missing (pandas semantics)") {
    val old = Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
    val neu = Seq((1, Double.NaN), (3, 30.0)).toDF("id", "v")
    // Dispatch sees the NaN → row-replace: NaN survives.
    val viaDispatch = Upsert.upsert(neu, old, Seq("id"))
      .orderBy("id").as[(Int, Double)].collect()
    assert(viaDispatch(0) === ((1, Double.NaN)) ||
      viaDispatch(0)._2.isNaN)
    // combineFirst fills the NaN cell from old.
    val viaCells = Upsert.combineFirst(neu, old, Seq("id"))
      .orderBy("id").as[(Int, Double)].collect()
    assert(viaCells(0) === ((1, 10.0)))
  }

  test("key-union golden (reference tests/test_upsert.py:17-48)") {
    val old = Seq((1, "o1"), (3, "o3"), (4, "o4")).toDF("id", "v")
    val neu = Seq((1, "n1"), (3, "n3"), (5, "n5"), (6, "n6")).toDF("id", "v")
    val got = Upsert.upsert(neu, old, Seq("id"))
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "n1"), (3, "n3"), (4, "o4"), (5, "n5"), (6, "n6")))
  }

  test("unequal column sets are rejected (reference export.py:383-390)") {
    val neu = Seq((1, "a")).toDF("id", "z")
    assertThrows[UpsertError] {
      Upsert.upsert(neu, old3, Seq("id"))
    }
  }

  test("append is a plain multiset union") {
    val neu = Seq((1, "A", "AA")).toDF("id", "x", "y")
    assert(Upsert.append(neu, old3).count() === 4)
    // duplicate rows are kept — no dedup on append
    assert(Upsert.append(old3, old3).count() === 6)
  }

  test("multi-column keys") {
    val old = Seq((1, 1, "a"), (1, 2, "b")).toDF("k1", "k2", "v")
    val neu = Seq((1, 2, "B"), (2, 1, "c")).toDF("k1", "k2", "v")
    val got = Upsert.upsert(neu, old, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Int, Int, String)].collect().toSeq
    assert(got === Seq((1, 1, "a"), (1, 2, "B"), (2, 1, "c")))
  }

  test("dotted column names are literal identifiers in every mode " +
    "(keys and cells): never parsed as nested-field access") {
    val newDf = Seq((1, "n1"), (3, "n3")).toDF("k.x", "v.y")
    val oldDf = Seq((1, "o1"), (2, "o2")).toDF("k.x", "v.y")
    val cell = Upsert.combineFirst(newDf, oldDf, Seq("k.x"))
      .orderBy(graft.checks.Validations.qcol("k.x"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(cell === Seq((1, "n1"), (2, "o2"), (3, "n3")))
    val row = Upsert.rowReplace(newDf, oldDf, Seq("k.x"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(row === Seq((1, "n1"), (2, "o2"), (3, "n3")))
    // the dispatch probe's missing() scan crosses the same names
    val withNull = Seq((1, "n1"), (3, null.asInstanceOf[String]))
      .toDF("k.x", "v.y")
    val dispatched = Upsert.upsert(withNull, oldDf, Seq("k.x"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(dispatched === Seq((1, "n1"), (2, "o2"), (3, null)))
  }
}
