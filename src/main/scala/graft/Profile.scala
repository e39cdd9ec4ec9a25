package graft

/** Scratch profiling main (not part of the driver contract) —
  * currently instrumented to decompose the UNSCREENED vector-ingest
  * per-batch cost (the one residual `weak` in VERDICT r13): run the
  * exact phases of [[graft.streaming.StreamOps.vectorIngestStream]]'s
  * steady-state branch DIRECTLY (no streaming wrapper, so trigger
  * overhead is out of frame) against a small and a 16× corpus, and
  * time each phase per batch — the growing term is the flattening
  * target. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.IndexStore
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def runScale(label: String, srcDir: String): Unit = {
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"prof_vec_$label").toString + "/c"
      val table = s"$corpusDir/embeddings.parquet"
      val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      // bootstrap: corpus + index, like the sink's first batch
      src.toSeq.toDF("vec_id", "embedding")
        .repartition(32).write.parquet(table)
      val boot = timed { IndexStore.ensure(spark, corpusDir) }
      val idxDir = IndexStore.dirFor(spark, corpusDir)
      println(f"[prof] $label%-6s n=${src.length} bootstrap $boot%.1f s")
      def freshVec(emb: Array[Float], batch: Int): Array[Float] = {
        val lag = (batch + 1) * 8 % emb.length
        emb.indices.map(j =>
          -emb((j + lag) % emb.length) - 0.001f * (batch + 1)).toArray
      }
      (0 until 8).foreach { i =>
        val b = src.take(1000).zipWithIndex.map { case ((_, emb), j) =>
          (900000000L + i.toLong * 1000 + j, freshVec(emb, i))
        }.toSeq.toDF("vec_id", "embedding")
        var fresh: org.apache.spark.sql.DataFrame = null
        val tAnti = timed {
          val corpusIds = spark.read.parquet(table).select("vec_id")
          fresh = graft.Materialize(
            b.dropDuplicates("vec_id")
              .join(corpusIds, Seq("vec_id"), "left_anti"))
          fresh.isEmpty
        }
        // standalone re-measure of the torn-probe counts appendBatch
        // pays (footer-driven; grows with accumulated file count)
        val tCnt = timed {
          spark.read.parquet(s"$idxDir/codes").count()
          spark.read.parquet(s"$idxDir/rcodes").count()
        }
        val tApp = timed { IndexStore.appendBatch(spark, idxDir, fresh) }
        val tW = timed {
          fresh.write.mode("append").parquet(table)
        }
        val nf = {
          val (fs, p) = graft.Scratch.fs(spark, idxDir)
          graft.Scratch.walkFiles(fs, p).count(
            _.getPath.getName.endsWith(".parquet"))
        }
        println(f"[prof] $label%-6s b$i anti $tAnti%5.2f cnt $tCnt%5.2f " +
          f"append $tApp%5.2f cwrite $tW%5.2f idxfiles $nf%d")
      }
      val (fs, p) = graft.Scratch.fs(spark, corpusDir)
      fs.delete(p, true)
      val (fs2, p2) = graft.Scratch.fs(spark, idxDir)
      fs2.delete(p2, true)
    }
    runScale("sf0.1", "/root/testdata/sf0.1")
    runScale("big", sys.env.getOrElse("SPARK_GRAFT_BIG_DIR", "/tmp/sf16ann"))
    spark.stop()
  }
}
