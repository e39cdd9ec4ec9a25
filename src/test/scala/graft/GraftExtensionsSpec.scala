package graft

/** The native expressions must be reachable from plain SQL once the
  * extension registrations are installed. */
class GraftExtensionsSpec extends SparkSpec {

  test("dot_f64 and word_shingles are SQL-callable after register()") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    val dot = s.sql(
      "SELECT dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
    // whitespace-robust (case is the caller's normalization concern)
    val sh = s.sql("SELECT word_shingles('a  B\tc d', 3) AS s")
      .head().getSeq[String](0)
    assert(sh === Seq("a B c", "B c d"))
  }
}
