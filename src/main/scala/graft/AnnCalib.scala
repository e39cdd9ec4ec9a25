package graft

/** Dial-calibration main: recall@k of the IVF index (q41 — plain IVF,
  * exact scoring inside probed cells, so recall loss is PURELY coarse
  * cell recall, the thing the nprobe dial controls) against the exact
  * brute-force top-k, at each requested nprobe value.
  *
  * Used to measure the (N, nl, minimal np for recall ≥ target) points
  * recorded in Similarity's dial doc; run against the decorrelated
  * replication corpora of scripts/make_ann_calib.py. One JSON line per
  * measurement; `np = 0` means "the current default dial" (curve/cap,
  * no override).
  *
  *   sbt "runMain graft.AnnCalib /tmp/sf16ann 0 24 32 40 48 56"
  */
object AnnCalib {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnCalib <sfDir> [np...] (0 = default dial)")
    val sfDir = args.head
    val nps = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(0)
    val spark = GraftSession.local("graft-anncalib")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val exact = pairs(operators.Similarity.q35KnnBrute(spark, sfDir))
    val n = sources.Tables.load(spark, sfDir, "embeddings").count()
    val nl = operators.Similarity.nlistFor(n)
    nps.foreach { np =>
      if (np == 0) System.clearProperty("graft.ann.nprobe")
      else System.setProperty("graft.ann.nprobe", np.toString)
      val effective = operators.Similarity.nprobeFor(nl)
      val t0 = System.nanoTime()
      val got = pairs(operators.Similarity.q41KnnIvf(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (exact intersect got).size.toDouble / exact.size
      println(s"""{"sf":${Json.str(sfDir)},"n":$n,"nl":$nl,""" +
        s""""np":$effective,"default_dial":${np == 0},""" +
        s""""recall":${f4(recall)},"frac":${f4(effective.toDouble / nl)},""" +
        s""""sec":${f4(sec)}}""")
    }
    System.clearProperty("graft.ann.nprobe")
    spark.stop()
  }
}
