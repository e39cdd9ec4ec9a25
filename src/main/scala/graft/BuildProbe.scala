package graft

/** Index-build cost probe: time [[operators.IndexStore.build]] from a
  * clean slate (the index dir is deleted before every run, so each
  * reading is the FULL train+assign+encode+write pipeline, no vtoken
  * shortcuts). One JSON line per run; pair runs at two corpus sizes to
  * fit the build-cost exponent — the number VERDICT r14 #2 asks for
  * (sample-bound Lloyd training should read ≈1.0, down from the
  * N^1.5-dominated full-corpus trainer).
  *
  *   sbt "runMain graft.BuildProbe /tmp/sf16ann 2"
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BuildProbe <sfDir> [runs]")
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local("graft-buildprobe")
    val dir = operators.IndexStore.dirFor(spark, sfDir)
    (1 to runs).foreach { i =>
      val (fs, p) = Scratch.fs(spark, dir)
      if (fs.exists(p)) fs.delete(p, true)
      val info = operators.IndexStore.build(spark, sfDir, dir)
      // the build's OWN n/nl (validNorm-filtered), and Json.f3 for the
      // locale-proof number rendering every probe main uses
      println(s"""{"probe":"annbuild","sf":${Json.str(sfDir)},""" +
        s""""n":${info.n},"nl":${info.nl},"run":$i,""" +
        s""""build_sec":${Json.f3(info.buildSec)}}""")
    }
    spark.stop()
  }
}
