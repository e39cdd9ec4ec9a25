package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

    // layout: run 1 pays the bucketed-table writes, runs 2-3 must be
    // pure join cost (catalog reuse) — if they aren't, the reuse seam
    // is broken
    t("q57 run1 (writes)")(graft.operators.Layout.q57BucketJoin(spark, sfDir).count())
    t("q57 run2 (reuse)")(graft.operators.Layout.q57BucketJoin(spark, sfDir).count())
    t("q57 run3 (reuse)")(graft.operators.Layout.q57BucketJoin(spark, sfDir).count())

    t("shingled.count")(docs.count())
    t("shingled.again")(docs.count())
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    t("exploded.count")(ex.count())
    val bands = Dedup.minhashBands(docs)
    t("minhashBands.count")(bands.count())
    val cand = Dedup.lshCandidates(bands)
    t("lshCandidates.count")(cand.count())
    t("q31 full")(Dedup.q31MinHashDedup(spark, sfDir).count())
    val sh = Dedup.simhashes(docs)
    t("simhashes.count")(sh.count())
    t("q32 full")(Dedup.q32SimHashDedup(spark, sfDir).count())

    // shuffle audit: physical Exchange count per query
    println("[prof] --- exchange counts ---")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // executedPlan: after EnsureRequirements (exchanges present)
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(p).length
        val nested = if (p.contains("BroadcastNestedLoopJoin")) " NESTEDLOOP" else ""
        val cart = if (p.contains("CartesianProduct")) " CARTESIAN" else ""
        println(f"[prof] $name%-28s exchanges=$exchanges%2d$nested$cart")
      } catch { case e: Throwable =>
        println(s"[prof] $name FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
