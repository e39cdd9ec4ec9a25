package graft

/** Isolation bench: time NAMED SparkEntry queries in a fresh session —
  * no index pre-build, no other queries, nothing else in the JVM —
  * for adjudicating whether a full-Bench reading is the query or its
  * context (GC/code-cache pressure from the 70-query loop, the index
  * build, co-tenant load during that bench window).
  *
  *   sbt "runMain graft.IsoBench /root/testdata/sf0.1 4 q36_knn_lsh"
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: IsoBench <sfDir> <runs> <query...>")
    val sfDir = args(0)
    // fail fast naming the argument (the GRAFT_VERIFY_PARALLEL
    // pattern): a non-integer or non-positive <runs> must not surface
    // as a bare NumberFormatException or an empty.min crash after the
    // whole session startup + warmup already ran
    val runs =
      try args(1).toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"<runs> must be an integer, got '${args(1)}' — usage: " +
            "IsoBench <sfDir> <runs> <query...>")
      }
    require(runs >= 1, s"<runs> must be >= 1, got $runs")
    val names = args.drop(2).toSeq
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local("graft-isobench")
    // the FULL Bench warmup (JIT + every table's parquet footers) so
    // run 1 is comparable — without the footer loop, run 1 here would
    // absorb first-touch metadata reads Bench's timed runs never pay,
    // biasing the query-vs-context adjudication this tool exists for.
    // Shared body, not a copy: a warmup tweak in Bench reaches here
    // automatically, keeping the adjudication valid by construction.
    Bench.warmup(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { i =>
        val s = Bench.timeNoop(fn(spark, sfDir))
        println(f"[iso] $name run$i $s%.3f s")
        s
      }
      println(f"[iso] $name min ${times.min}%.3f med ${times.sorted.apply(times.size / 2)}%.3f")
    }
    spark.stop()
  }
}
