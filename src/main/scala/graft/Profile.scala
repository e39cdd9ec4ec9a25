package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.sources.Tables

/** Scratch profiling main (not part of the driver contract) —
  * currently instrumented for the q72/q73 retrieval stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    Bench.warmup(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    t("docs.count")(docs.count())
    import graft.functions.TextFunctions.{tokenCount, tokens}
    val qterms = spark.createDataFrame(Retrieval.bm25Queries)
      .toDF("query_id", "qtext")
      .select(col("query_id"), explode(tokens(col("qtext"))).as("token"))
      .distinct()
    t("qterms.count")(qterms.count())
    val tf = docs.select(col("doc_id"), tokenCount(col("text")).as("dl"),
        col("text"))
      .select(col("doc_id"), col("dl"),
        explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    t("termFreqs.count")(tf.count())
    t("termFreqs.again")(tf.count())
    val pruned = tf.join(broadcast(qterms.select(col("token")).distinct()),
      "token")
    t("pruned.count")(pruned.count())
    t("q72 full")(Retrieval.q72Bm25TopK(spark, sfDir).count())
    t("q72 again")(Retrieval.q72Bm25TopK(spark, sfDir).count())
    t("q73 full")(Retrieval.q73HybridRrf(spark, sfDir).count())
    println("[prof] --- q72 executed plan ---")
    println(Retrieval.q72Bm25TopK(spark, sfDir)
      .queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
