package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingles3
import graft.operators.Dedup

/** Pins the [[Materialize]] deployment seam: `local` (localCheckpoint)
  * and `reliable` (checkpoint into a fault-tolerant dir) must produce
  * IDENTICAL results for a full dedup pipeline — the seam may change
  * failure recovery and IO cost, never answers — plus the two
  * misconfiguration paths.
  *
  * Test ORDER is load-bearing: `SparkContext.setCheckpointDir` has no
  * unset API, so the missing-dir negative test must run before any
  * reliable-mode test sets a dir on the shared session.
  */
class MaterializeSpec extends SparkSpec {

  /** Materialize-heavy dedup pipeline: shingle → MinHash/LSH near-dup
    * pairs → star connected components (materializes every round). */
  private def dedupPipeline(): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "the quick brown fox jumps over the lazy dog once more today"),
      (4L, "pack my box with five dozen liquor jugs before the night ends"),
      (5L, "pack my box with five dozen liquor jugs before the night ends."),
      (6L, "a completely unrelated document about distributed query engines"),
      (7L, "another entirely distinct text concerning parquet column pruning"),
      (8L, "the quick brown fox jumps over the lazy dog again and again?"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    Dedup.connectedComponentsStar(
      Dedup.nearDupPairs(docs, 0.5), "doc_a", "doc_b")
  }

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Materialize.ModeKey, mode)
    try body finally spark.conf.unset(Materialize.ModeKey)
  }

  test("reliable mode without a checkpoint dir fails loudly") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition: this test must run before any reliable-mode test")
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      withMode("reliable")(Materialize(df))
    }
    assert(e.getMessage.contains(Materialize.DirKey))
  }

  test("an unknown mode fails loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      withMode("lokal")(Materialize(df))
    }
    assert(e.getMessage.contains("lokal"))
  }

  test("local and reliable modes produce identical dedup-pipeline results") {
    import spark.implicits._
    val local = withMode("local") {
      dedupPipeline().as[(Long, Long)].collect().sorted.toSeq
    }
    // near-dup groups {1,2,3,8} and {4,5} must actually cluster, or the
    // pipeline exercised nothing
    assert(local.nonEmpty && local.toMap.apply(8L) == 1L)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.conf.set(Materialize.DirKey, ckpt.toString)
    val reliable =
      try withMode("reliable") {
        dedupPipeline().as[(Long, Long)].collect().sorted.toSeq
      } finally spark.conf.unset(Materialize.DirKey)
    assert(reliable === local)

    // the reliable path genuinely checkpointed (dir is populated), and
    // the dir the seam set is the one we configured
    assert(spark.sparkContext.getCheckpointDir.exists(_.contains(ckpt.toString)))
    val populated = java.nio.file.Files.walk(ckpt).count() > 1
    assert(populated, s"expected checkpoint files under $ckpt")
  }

  test("q68's residual-ANN pipeline is identical across modes") {
    // the newest Materialize consumer: k-means centroids, residual
    // table and PQ codebooks all checkpoint inside one query — exact
    // surfaced cosines must be bit-equal whichever mechanism ran.
    // Self-sufficient: sets its own checkpoint dir so it passes in
    // isolation (-z "q68") and after an earlier-test failure alike
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_q68")
    spark.conf.set(Materialize.DirKey, ckpt.toString)
    try {
      def rows(): Seq[String] = graft.operators.Similarity
        .q68KnnIvfPqRes(spark, sfDir).collect().map(_.toString).toSeq
      val local = withMode("local")(rows())
      assert(local.nonEmpty)
      val reliable = withMode("reliable")(rows())
      assert(reliable === local)
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("Dataset.observe metrics ride the eager checkpoint's own job " +
    "in BOTH modes — the CC loops' moved-count costs no extra action") {
    // r19 (VERDICT r18 #4): connectedComponents/Star read their
    // convergence count from an Observation attached to the
    // materialized frame instead of a separate count() job. This pins
    // the mechanism: the metric is delivered by the materialize action
    // itself, in local mode from exactly ONE job.
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    def observedMoved(): Long = {
      val obs = new org.apache.spark.sql.Observation()
      val df = spark.range(100).toDF("x")
        .withColumn("moved", col("x") % 2 === 0)
        .observe(obs, sum(when(col("moved"), 1L).otherwise(0L)).as("m"))
      Materialize(df)
      obs.get("m").asInstanceOf[Long]
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      withMode("local") {
        jobs = 0
        assert(observedMoved() == 50L)
        // listener delivery is async — poll until the count settles
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (jobs < 1 && System.nanoTime() < deadline) Thread.sleep(20)
        Thread.sleep(200) // absorb any trailing job event
        assert(jobs == 1, s"local-mode materialize+observe ran $jobs " +
          "jobs — the moved count must ride the checkpoint job")
      }
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_obs")
      spark.conf.set(Materialize.DirKey, ckpt.toString)
      try withMode("reliable") {
        // reliable checkpointing legitimately runs extra jobs (the
        // checkpoint write re-materializes); the pinned property here
        // is only that the metric ARRIVES and is usable as a
        // convergence signal (zero stays zero under re-execution)
        assert(observedMoved() == 50L)
      } finally spark.conf.unset(Materialize.DirKey)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
