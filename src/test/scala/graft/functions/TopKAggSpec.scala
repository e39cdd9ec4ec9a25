package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TopKAgg: the bounded insertion buffer must agree with full-sort
  * take(k) under arbitrary inputs and merge orders, and the aggregate
  * query must equal the window formulation row for row. */
class TopKAggSpec extends SparkSpec {

  test("buffer matches sort.take(k) on fuzzed inputs, any merge split") {
    val rng = new scala.util.Random(99)
    for (trial <- 1 to 200) {
      val k = 1 + rng.nextInt(5)
      val n = rng.nextInt(40)
      // duplicate scores on purpose: tie-break must be id ASC
      val xs = Seq.fill(n)((rng.nextInt(8).toDouble, rng.nextLong(1000)))
      val expect = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      val whole = new TopKAgg.Buffer(k)
      xs.foreach { case (s, i) => whole.offer(s, i) }
      def drain(b: TopKAgg.Buffer) =
        (0 until b.size).map(j => (b.scores(j), b.ids(j)))
      assert(drain(whole) == expect, s"trial $trial (single buffer)")
      // random split + merge must give the same result
      val cut = if (n == 0) 0 else rng.nextInt(n + 1)
      val (l, r) = xs.splitAt(cut)
      val b1 = new TopKAgg.Buffer(k); l.foreach { case (s, i) => b1.offer(s, i) }
      val b2 = new TopKAgg.Buffer(k); r.foreach { case (s, i) => b2.offer(s, i) }
      (0 until b2.size).foreach(j => b1.offer(b2.scores(j), b2.ids(j)))
      assert(drain(b1) == expect, s"trial $trial (merged at $cut)")
    }
  }

  test("NaN and signed-zero scores follow Spark's DoubleType total " +
    "order (NaN first, -0.0 == 0.0), any arrival order") {
    // reference comparator = Spark's ORDER BY s DESC, id ASC
    def cmpS(a: Double, b: Double): Int =
      if (a.isNaN && b.isNaN) 0 else if (a.isNaN) 1 else if (b.isNaN) -1
      else if (a < b) -1 else if (a > b) 1 else 0
    val ord = new Ordering[(Double, Long)] {
      def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = -cmpS(x._1, y._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    }
    val pool = Array(Double.NaN, -0.0, 0.0, 1.5, -2.5, 7.0)
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val k = 1 + rng.nextInt(4)
      val xs = Seq.fill(rng.nextInt(30))(
        (pool(rng.nextInt(pool.length)), rng.nextLong(1000)))
      val expect = xs.sorted(ord).take(k)
      val b = new TopKAgg.Buffer(k)
      xs.foreach { case (s, i) => b.offer(s, i) }
      val got = (0 until b.size).map(j => (b.scores(j), b.ids(j)))
      // compare raw bit patterns: Scala's numeric equality makes
      // NaN != NaN (and -0.0 == 0.0), which is exactly the wrong
      // notion for a bit-level agreement pin
      def bits(s: Seq[(Double, Long)]) =
        s.map { case (v, i) => (java.lang.Double.doubleToRawLongBits(v), i) }
      assert(bits(got) == bits(expect), s"trial $trial: $xs")
    }
    // and end-to-end: the aggregate equals the window formulation on a
    // NaN-bearing frame (a NaN score must rank FIRST, as the window
    // sort ranks it — the pre-fix primitive compare dropped or
    // misplaced it depending on arrival order)
    import spark.implicits._
    val df = Seq((1, Double.NaN, 10L), (1, 1.0, 11L), (1, -0.0, 12L),
      (1, 0.0, 13L), (1, 2.0, 14L)).toDF("g", "s", "i")
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKAgg.topkAgg(col("s"), col("i"), 3).as("top"))
      .select(posexplode(col("top")))
      .select(col("pos"), col("col.id"))
      .as[(Int, Long)].collect().toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("i"))
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select((col("rnk") - 1).cast("int"), col("i"))
      .as[(Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.map(_._2).contains(10L)) // the NaN row made the cut
  }

  test("input contract: numeric inputs coerce at analysis, strings are rejected") {
    import spark.implicits._
    val df = Seq((1, BigDecimal("3.5"), 7), (1, BigDecimal("9.5"), 8))
      .toDF("g", "score", "id")
    // DECIMAL score / INT id: the analyzer inserts casts (previously a
    // mid-task ClassCastException from asInstanceOf[Double])
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topkAgg(col("score"), col("id"), 1).as("top"))
      .select(explode(col("top")))
      .select(col("col.score"), col("col.id"))
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((9.5, 8L)))
    // a score type with no implicit cast to DOUBLE (array): must fail
    // at ANALYSIS, not at execution. (STRING scores coerce like any
    // Spark numeric context: CAST('..' AS DOUBLE), which under ANSI
    // raises a clear cast error — not the old ClassCastException.)
    val bad = Seq((1, Array(1.0), 7)).toDF("g", "score", "id")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy(col("g"))
        .agg(TopKAgg.topkAgg(col("score"), col("id"), 1))
        .collect()
    }
  }

  test("q55 aggregate equals the row_number window formulation") {
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("int").as("rnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
      .collect().toSeq
    val viaAgg = graft.operators.Advanced
      .q55TopOrdersAgg(spark, sfDir).collect().toSeq
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }
}
