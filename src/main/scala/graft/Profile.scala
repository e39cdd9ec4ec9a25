package graft

/** Scratch profiling main (not part of the driver contract) —
  * currently instrumented to run the REAL screenedVectorIngestStream
  * at the 16× corpus and dump per-trigger progress durations, to find
  * where the streaming per-batch wall-clock goes (the operator stages
  * themselves measure ~5 s, the streaming windows read ~47 s). */
object Profile {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf16ann")
    val spark = GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{IndexStore, IngestScreen}
    val corpusDir = java.nio.file.Files
      .createTempDirectory("prof_svec2").toString + "/c"
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def freshVec(emb: Array[Float], batch: Int): Array[Float] = {
      val lag = (batch + 1) * 8 % emb.length
      emb.indices.map(j =>
        -emb((j + lag) % emb.length) - 0.001f * (batch + 1)).toArray
    }
    val ms = MemoryStream[(Long, Array[Float])]
    val q = streaming.StreamOps.screenedVectorIngestStream(
        ms.toDF().toDF("vec_id", "embedding"), corpusDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("prof_svec2_ckpt").toString)
      .start()
    def awaitConsumed(expected: Long): Unit = {
      var sum = -1L
      while (sum < expected) {
        q.processAllAvailable()
        sum = q.recentProgress.map(_.numInputRows).sum
        if (sum < expected) Thread.sleep(200)
      }
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    try {
      val boot = timed { ms.addData(src.toSeq); awaitConsumed(src.length) }
      println(f"[prof] boot $boot%.1f s")
      (0 until 3).foreach { i =>
        val b = src.take(1000).zipWithIndex.map { case ((_, emb), j) =>
          (10000000L + i.toLong * 1000 + j, freshVec(emb, i))
        }.toSeq
        val s = timed {
          ms.addData(b); awaitConsumed(src.length + (i + 1).toLong * 1000)
        }
        println(f"[prof] batch $i window $s%.1f s")
        q.recentProgress.takeRight(3).foreach { p =>
          println(s"[prof]   trigger batchId=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      }
    } finally q.stop()
    spark.stop()
  }
}
