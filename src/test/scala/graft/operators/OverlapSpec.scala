package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import graft.SparkSpec

/** Failure injection for [[Similarity.overlapped]] (ADVICE r18): a
  * caller whose own chain fails between launch and join must CANCEL
  * the background chain's jobs — not orphan them against the cluster —
  * and the background future's outcome must be observed, never a
  * dangling unobserved failure. */
class OverlapSpec extends SparkSpec {

  test("guarded cancels the background job group when the caller " +
    "fails, and the join handle reports the cancellation") {
    val sc = spark.sparkContext
    // started-signal via a marker file: the task closure is SERIALIZED
    // even in local mode, so an in-memory latch would be a
    // deserialized copy — a file is the same object for everyone
    val marker = java.nio.file.Files.createTempDirectory("overlap")
      .resolve("started").toString
    // a background action slow enough (~30 s if never cancelled) that
    // the assertion below can only pass via actual cancellation
    val handle = Similarity.overlapped {
      sc.range(0, 1200, 1, 4).mapPartitions { it =>
        new java.io.File(marker).createNewFile()
        it.map { i => Thread.sleep(100); i }
      }.count()
    }
    val startDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!new java.io.File(marker).exists() &&
      System.nanoTime() < startDeadline) Thread.sleep(20)
    assert(new java.io.File(marker).exists(),
      "background chain never started")
    val t0 = System.nanoTime()
    val boom = intercept[RuntimeException] {
      handle.guarded { throw new RuntimeException("caller failed") }
    }
    assert(boom.getMessage == "caller failed") // the CALLER's failure wins
    val guardedSec = (System.nanoTime() - t0) / 1e9
    // guarded awaited the cancelled future: well under the ~20 s the
    // uncancelled job would need, and the handle now rethrows the
    // cancellation instead of blocking to completion
    assert(guardedSec < 15.0, s"guarded took $guardedSec s — cancel " +
      "did not take effect")
    // the handle must complete exceptionally (the cancelled job), and
    // fast — never block out the full uncancelled runtime
    val t1 = System.nanoTime()
    val joinFailure = intercept[Throwable] { handle() }
    assert((System.nanoTime() - t1) / 1e9 < 15.0)
    assert(joinFailure != null)
  }

  test("an unfailed caller section joins normally and gets the value") {
    val handle = Similarity.overlapped(spark.range(100).count())
    val section = handle.guarded(21 * 2)
    assert(section == 42)
    assert(handle() == 100L)
  }

  test("background jobs run under a dedicated graft-overlap job group " +
    "(the cancellation handle)") {
    @volatile var sawGroup = false
    val listener = new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = ()
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = e.properties.getProperty("spark.jobGroup.id")
        if (g != null && g.startsWith("graft-overlap-")) sawGroup = true
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val h = Similarity.overlapped(spark.range(10).count())
      assert(h() == 10L)
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!sawGroup && System.nanoTime() < deadline) Thread.sleep(50)
      assert(sawGroup, "no job carried the graft-overlap job group")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
