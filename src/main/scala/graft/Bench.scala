package graft

/** Benchmark main: every SparkEntry query, per-query MEDIAN of n runs.
  *
  * Medians because single-shot numbers in a shared sandbox swing ±2.5×
  * under co-tenant load (round-2 lesson: one query recorded 20.4 s,
  * re-ran at 8.1 s) — decisions can't be driven off one sample. A query
  * that throws is recorded as -1 with its message in an "errors" field,
  * never as a normal-looking elapsed time.
  */
object Bench {
  private val runsPerQuery = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // Untimed warmup: JIT/codegen paths and parquet footers, so the
    // first measured query doesn't absorb session startup.
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => () }
    }
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runsPerQuery).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop write materializes every row through the FULL plan —
        // count() would let Catalyst eliminate final sorts/projections.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += name -> e.toString.replaceAll("[\"\\\\\n]", " ").take(200)
            None
        }
      }
      val median =
        if (times.isEmpty) -1.0
        else times.sorted.apply(times.size / 2)
      name -> median
    }
    // 3-decimal seconds keep the whole line compact: the driver records
    // only an output TAIL, and a long line risks losing its own head
    def f3(v: Double): String = // Locale.ROOT: '.' decimal separator always
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => Json.str(k) + ":" + Json.str(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":$runsPerQuery,"queries":$qs,"errors":$errJson,"sf":${Json.str(sfDir)}}""")
    spark.stop()
  }
}
