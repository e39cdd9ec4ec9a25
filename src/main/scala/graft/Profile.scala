package graft

/** Scratch profiling main (not part of the driver contract) —
  * currently instrumented as a PLAN AUDIT for the round-13 additions:
  * prints the executed plans of q76 (ingest screen, gate shape) and
  * q77 (quality keeper) so join strategies / pruning / aggregate
  * shapes can be read and pinned. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, sfDir)
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      println(s"==== $name (executed, AQE-final) ====")
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    audit("q76_ingest_screen",
      operators.IngestScreen.q76IngestScreen(spark, sfDir))
    audit("q77_cluster_keeper",
      operators.Dedup.q77ClusterKeeper(spark, sfDir))
    spark.stop()
  }
}
