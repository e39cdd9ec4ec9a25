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
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local("graft-isobench")
    // same warmup as Bench so run 1 is comparable
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[iso] $name run$i $s%.3f s")
        s
      }
      println(f"[iso] $name min ${times.min}%.3f med ${times.sorted.apply(times.size / 2)}%.3f")
    }
    spark.stop()
  }
}
