package graft

/** Subprocess target for GraftSessionSpec: builds a REAL session through
  * the production wiring ([[GraftSession.local]]) in a fresh JVM — the
  * only place the full contract is observable, because extensions are
  * static at session creation and the suite JVM already holds a shared
  * non-Graft session — and prints the resolved contract for the spec to
  * assert on. One `k=v` line per conf, then a live proof that the
  * extensions actually installed (dot_f64 is SQL-callable only through
  * GraftExtensions' injector).
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-conf-probe")
    val out = new StringBuilder
    def p(k: String, v: String): Unit = out.append(s"probe:$k=$v\n")
    p("master", spark.sparkContext.master)
    Seq(
      "spark.sql.extensions",
      "spark.sql.session.timeZone",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "spark.cleaner.referenceTracking.cleanCheckpoints",
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    ).foreach(k => p(k, spark.conf.getOption(k).getOrElse("<unset>")))
    p("dot_f64", spark.sql(
      "SELECT dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect()(0).getDouble(0).toString)
    // one print at the end: Spark logs interleave on stdout, and a
    // torn line would flake the parse
    print(out)
    spark.stop()
  }
}
