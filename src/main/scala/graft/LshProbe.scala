package graft

/** LSH candidate-fraction probe (VERDICT r16 #2's "Done" artifact):
  * for each corpus dir argument, measures q36's candidate stage —
  * corpus size, the N-adaptive dials ([[graft.operators.Similarity
  * .lshBitsFor]] / [[graft.operators.Similarity.lshProbeRadiusFor]]),
  * the distinct candidate-pair count, and the fraction of the corpus a
  * query's candidate stream touches (pairs / (queries · N)). Under the
  * fixed legacy dials that fraction was ~constant (~N candidates per
  * query — brute force with extra steps); under the scaled dials it
  * must FALL with N. Emits one `{"metric":"lshprobe",...}` JSON line.
  *
  * Usage: `runMain graft.LshProbe <sfDir> [<sfDir> ...]` */
object LshProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshProbe <sfDir> [<sfDir> ...]")
    val spark = GraftSession.builder("graft-lshprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val rows = args.toSeq.map { dir =>
      val e = graft.sources.Tables.load(spark, dir, "embeddings")
      val n = e.count()
      val bits = Similarity.lshBitsFor(n)
      val radius = Similarity.lshProbeRadiusFor(bits)
      val t0 = System.nanoTime()
      val pairs = Similarity.lshCandidates(e, bits).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val frac = pairs.toDouble / (Similarity.knnQueries * math.max(1L, n))
      println(f"[lshprobe] $dir%-40s n=$n%8d bits=$bits radius=$radius " +
        f"pairs=$pairs%9d frac=$frac%.4f (${sec}%.1f s)")
      s"""{"dir":${Json.str(dir)},"n":$n,"bits":$bits,""" +
        s""""radius":$radius,"cand_pairs":$pairs,""" +
        s""""cand_frac":${Json.f3(frac)},"cand_sec":${Json.f3(sec)}}"""
    }
    println(s"""{"metric":"lshprobe","points":[${rows.mkString(",")}]}""")
  }
}
