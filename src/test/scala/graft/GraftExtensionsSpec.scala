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
    // winnowing fingerprints agree with the DataFrame-side helper
    val sql = s.sql(
      "SELECT winnow_fingerprints('the quick brown fox jumps', 8, 4) AS f")
      .head().getSeq[Long](0)
    import org.apache.spark.sql.functions._
    import s.implicits._
    val df = Seq("the quick brown fox jumps").toDF("text")
      .select(graft.functions.TextFunctions.winnow(col("text"), 8, 4))
      .head().getSeq[Long](0)
    assert(sql === df && sql.nonEmpty)
    // topk_agg is SQL-callable as a grouped aggregate
    val tk = s.sql(
      """SELECT g, topk_agg(s, i, 2) AS top FROM VALUES
        |  (1, 5.0d, 10L), (1, 7.0d, 11L), (1, 7.0d, 9L), (2, 1.0d, 3L)
        |  AS t(g, s, i)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val top1 = tk(0).getSeq[org.apache.spark.sql.Row](1)
    assert(top1.map(r => (r.getDouble(0), r.getLong(1)))
      === Seq((7.0, 9L), (7.0, 11L)))
    assert(tk(1).getSeq[org.apache.spark.sql.Row](1).length === 1)
  }

  test("dot_f64 null semantics exactly match the HOF form") {
    // The session-wide rewrite must be invisible: length mismatch and
    // null elements yield NULL in the zip_with/aggregate form (null
    // padding / null element poisons the fold), so dot_f64 must too.
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    import s.implicits._
    val rows = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),    // 11.0
      (Seq[java.lang.Double](1.0, 2.0, 9.0), Seq[java.lang.Double](3.0, 4.0)), // null: lengths differ
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))   // null: null element
    val df = rows.toDF("a", "b").select(
      graft.functions.VectorFunctions.dotD(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    val got = df.collect()
    assert(got(0).getDouble(0) === 11.0 && got(0).getDouble(1) === 11.0)
    (1 to 2).foreach { i =>
      assert(got(i).isNullAt(0) === got(i).isNullAt(1))
      assert(got(i).isNullAt(0), s"row $i should be null")
    }
  }

  test("DotProductRule rewrites the HOF dot product to dot_f64") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      Seq(graft.functions.DotProductRule)
    // non-foldable input (derived from id) or constant folding would
    // evaluate the whole expression before the rule can fire
    val df = s.range(1).select(
        array((col("id") + 1).cast("double"), lit(2.0), lit(3.0)).as("a"),
        array(lit(4.0), lit(5.0), lit(6.0)).as("b"))
      .select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_f64"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.head().getDouble(0) === 32.0)
  }
}
