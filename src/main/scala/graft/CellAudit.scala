package graft

import org.apache.spark.sql.functions._

/** IVF cell-population audit (VERDICT r14 #5): clustered corpora
  * concentrate mass, and a probed mega-cell is the vector twin of a
  * hot lexical posting — per-task work in every cell join
  * (queryIvfPq's probe, queryEmbedDedup's verify, the ingest screen)
  * is proportional to the PROBED cells' sizes, so an unbounded cell
  * caps nothing. This probe ensures the index and prints the per-cell
  * row distribution (max/p99/median/min + the max/median ratio) as one
  * JSON line per dir — the number that decides whether a cell-split
  * policy is needed.
  *
  *   sbt "runMain graft.CellAudit /tmp/mog36k /tmp/mog36kd"
  */
object CellAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CellAudit <sfDir>...")
    val spark = GraftSession.local("graft-cellaudit")
    args.foreach { sfDir =>
      val info = operators.IndexStore.ensure(spark, sfDir)
      // n=0 guard (q76's rule): an empty/all-invalid-norm corpus
      // builds an index with NO codes table — the read below would
      // throw PATH_NOT_FOUND, and sizes.last/head on an empty array
      // would throw either way. Nothing to audit; say so and move on.
      if (info.n == 0) {
        println(s"""{"probe":"cellaudit","sf":${Json.str(sfDir)},""" +
          s""""n":0,"cells_used":0}""")
      } else {
      val sizes = operators.IndexStore
        .withDeltaOf(spark, info.dir, "codes")(_.filter(col("sub") === 0))
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .select(col("c")).collect().map(_.getLong(0)).sorted
      val n = sizes.length
      // percentile_disc rank: 0-based index ceil(p·n)−1. The earlier
      // (p·n).toInt form indexed p99 at sizes.last for any n ≤ 100
      // cells (every gate-scale index), printing max==p99 and a
      // max/p99 spread of 1.0 — hiding exactly the single-outlier
      // mega-cell this probe exists to surface.
      def pct(p: Double): Long =
        sizes(math.max(0, math.min(n - 1, math.ceil(p * n).toInt - 1)))
      val med = pct(0.5)
      println(s"""{"probe":"cellaudit","sf":${Json.str(sfDir)},""" +
        s""""n":${info.n},"nl":${info.nl},"cells_used":$n,""" +
        s""""max":${sizes.last},"p99":${pct(0.99)},"median":$med,""" +
        s""""min":${sizes.head},"max_over_median":${
          String.format(java.util.Locale.ROOT, "%.2f",
            Double.box(sizes.last.toDouble / math.max(1L, med)))}}""")
      }
    }
    spark.stop()
  }
}
