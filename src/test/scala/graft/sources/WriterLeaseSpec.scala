package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IndexStore

/** Writer lease + fencing: mutual exclusion between live writers,
  * TTL takeover of a dead one's lease (epoch bumped), commit-point
  * fencing of a resurrected stale writer, reentrancy, and the store
  * integration (a mutator refused under a foreign live lease leaves
  * the store serving and intact). */
class WriterLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def withDials[T](ttlMs: Long, waitMs: Long)(body: => T): T = {
    val oldT = System.getProperty("graft.lease.ttlMs")
    val oldW = System.getProperty("graft.lease.waitMs")
    System.setProperty("graft.lease.ttlMs", ttlMs.toString)
    System.setProperty("graft.lease.waitMs", waitMs.toString)
    try body finally {
      if (oldT == null) System.clearProperty("graft.lease.ttlMs")
      else System.setProperty("graft.lease.ttlMs", oldT)
      if (oldW == null) System.clearProperty("graft.lease.waitMs")
      else System.setProperty("graft.lease.waitMs", oldW)
    }
  }

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("lease_store").toString + "/s"

  private def leaseFile(dir: String) = WriterLease.leasePathOf(dir)

  private def writeForeign(dir: String, epoch: Long,
      ageMs: Long = 0L, garbled: Boolean = false): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
    val out = fs.create(p, true)
    val body =
      if (garbled) "not a lease"
      else s"graftlease|1|$epoch|foreign-owner|someop"
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (ageMs > 0)
      fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
  }

  private def exists(path: String): Boolean = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    fs.exists(p)
  }

  test("acquire/release roundtrip: the lease file exists exactly " +
    "while the body runs, epoch 1 on a clean store") {
    val dir = tmpStore()
    assert(!exists(leaseFile(dir)))
    WriterLease.withWrite(spark, dir, "test") {
      assert(exists(leaseFile(dir)))
      assert(WriterLease.heldEpoch(spark, dir).contains(1L))
      WriterLease.verify(spark, dir) // ours — no throw
    }
    assert(!exists(leaseFile(dir)), "lease not released")
    assert(WriterLease.heldEpoch(spark, dir).isEmpty)
  }

  test("a live foreign lease blocks a second writer loudly after the " +
    "bounded wait; a garbled one blocks the same way (conservative)") {
    withDials(ttlMs = 60000, waitMs = 300) {
      val dir = tmpStore()
      writeForeign(dir, epoch = 3)
      val e = intercept[LeaseHeldException] {
        WriterLease.withWrite(spark, dir, "test") { fail("ran under a " +
          "foreign live lease") }
      }
      assert(e.getMessage.contains("foreign-owner"))
      writeForeign(dir, epoch = 3, garbled = true)
      intercept[LeaseHeldException] {
        WriterLease.withWrite(spark, dir, "test") { fail("ran under a " +
          "garbled live lease") }
      }
    }
  }

  test("an EXPIRED foreign lease is taken over with the fencing epoch " +
    "bumped; a garbled expired one restarts the chain at epoch 1") {
    withDials(ttlMs = 400, waitMs = 300) {
      val dir = tmpStore()
      writeForeign(dir, epoch = 7, ageMs = 5000)
      WriterLease.withWrite(spark, dir, "test") {
        assert(WriterLease.heldEpoch(spark, dir).contains(8L),
          "takeover must bump the dead holder's epoch")
      }
      writeForeign(dir, epoch = 9, ageMs = 5000, garbled = true)
      WriterLease.withWrite(spark, dir, "test") {
        assert(WriterLease.heldEpoch(spark, dir).contains(1L))
      }
    }
  }

  test("fencing: a writer whose lease was taken over aborts at " +
    "verify, and release leaves the usurper's lease file intact") {
    val dir = tmpStore()
    intercept[StaleWriterException] {
      WriterLease.withWrite(spark, dir, "test") {
        // forge the takeover mid-operation
        writeForeign(dir, epoch = 99)
        WriterLease.verify(spark, dir)
      }
    }
    // the foreign (new owner's) lease survives our release
    val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
    val line = new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
    assert(line.contains("foreign-owner"),
      "release deleted a lease that was no longer ours")
    // and the handle stays poisoned: a retry needs a NEW withWrite,
    // which now (live foreign lease) waits/refuses as usual
  }

  test("reentrancy: a nested withWrite on the same store runs under " +
    "the outer lease; only the outer exit releases") {
    val dir = tmpStore()
    WriterLease.withWrite(spark, dir, "outer") {
      val outerEpoch = WriterLease.heldEpoch(spark, dir)
      WriterLease.withWrite(spark, dir, "inner") {
        assert(WriterLease.heldEpoch(spark, dir) == outerEpoch)
      }
      assert(exists(leaseFile(dir)), "inner exit released the lease")
      WriterLease.verify(spark, dir)
    }
    assert(!exists(leaseFile(dir)))
  }

  test("verify is a no-op for a store this JVM holds no lease on " +
    "(internal heal paths, specs)") {
    val dir = tmpStore()
    WriterLease.verify(spark, dir) // no lease anywhere — fine
    writeForeign(dir, epoch = 1)
    WriterLease.verify(spark, dir) // foreign lease, not ours to check
  }

  test("verify from a NON-acquiring thread during another thread's " +
    "bounded wait is a no-op and does not poison the acquirer") {
    withDials(ttlMs = 60000, waitMs = 2000) {
      val dir = tmpStore()
      writeForeign(dir, epoch = 3) // live foreign holder
      val acquired = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val a = new Thread(() =>
        try WriterLease.withWrite(spark, dir, "acquirer") {
          acquired.set(true)
        } catch { case t: Throwable => failed.set(t) })
      a.start()
      Thread.sleep(300) // a is now inside its bounded wait (epoch 0)
      // a lease-less heal/serve path fencing THIS dir must see "not my
      // handle" and return — before the thread-ownership scoping it
      // read the foreign line, poisoned a's handle, and threw from a
      // thread holding nothing
      WriterLease.verify(spark, dir)
      // free the store: a's wait should now succeed cleanly
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
      fs.delete(p, false)
      a.join(5000)
      assert(failed.get() == null,
        s"acquirer failed after a foreign-thread verify: ${failed.get()}")
      assert(acquired.get(), "acquirer never ran its body")
    }
  }

  test("release deletes an unparsable lease file that still carries " +
    "our owner id (torn heartbeat rewrite), and never deletes garbled " +
    "foreign debris") {
    val dir = tmpStore()
    var ownerId: String = null
    WriterLease.withWrite(spark, dir, "test") {
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
      ownerId = new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
        .split('|')(3)
      // forge a torn rewrite: unparsable line, our uuid still legible
      val out = fs.create(p, true)
      try out.write(s"torn $ownerId torn".getBytes("UTF-8"))
      finally out.close()
    }
    assert(!exists(leaseFile(dir)), "release left OUR torn lease " +
      "behind — every later writer pays a full TTL on a free store")
    // garbled debris NOT ours: release must leave it (could be a
    // foreign holder mid-rewrite)
    WriterLease.withWrite(spark, dir, "test2") {
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
      val out = fs.create(p, true)
      try out.write("not a lease at all".getBytes("UTF-8"))
      finally out.close()
    }
    assert(exists(leaseFile(dir)),
      "release deleted a garbled lease it could not prove was ours")
    val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
    fs.delete(p, false)
  }

  test("heartbeat renews the lease while a long mutation runs: after " +
    "sleeping past several TTLs the lease still reads live") {
    withDials(ttlMs = 400, waitMs = 300) {
      val dir = tmpStore()
      WriterLease.withWrite(spark, dir, "slow") {
        Thread.sleep(1300) // > 3 × ttl; heartbeat period = ttl/4
        val (fs, p) = graft.Scratch.fs(spark, leaseFile(dir))
        val age = System.currentTimeMillis() -
          fs.getFileStatus(p).getModificationTime
        // any age clearly below the 1300 ms sleep proves renewal ran;
        // the loose 800 ms bound absorbs scheduler stalls on a loaded
        // host (the tight claim — age <= ttl — is what production
        // relies on, but asserting it here flakes under CI steal)
        assert(age <= 800, s"lease mtime is $age ms old — heartbeat " +
          "not renewing; a contender would steal a LIVE writer's lease")
      }
    }
  }

  test("a second THREAD of the same process queues on the registry " +
    "and refuses with the same loud exception after the bounded wait") {
    withDials(ttlMs = 60000, waitMs = 400) {
      val dir = tmpStore()
      val inBody = new java.util.concurrent.CountDownLatch(1)
      val releaseA = new java.util.concurrent.CountDownLatch(1)
      val a = new Thread(() =>
        WriterLease.withWrite(spark, dir, "holder") {
          inBody.countDown()
          releaseA.await()
        })
      a.start()
      inBody.await()
      try {
        val e = intercept[LeaseHeldException] {
          WriterLease.withWrite(spark, dir, "contender") {
            fail("two threads held one store's lease")
          }
        }
        assert(e.getMessage.contains("another writer thread"))
      } finally {
        releaseA.countDown()
        a.join()
      }
      // after the holder exits, the store is free again
      WriterLease.withWrite(spark, dir, "after") {
        assert(WriterLease.heldEpoch(spark, dir).contains(1L))
      }
    }
  }

  test("store integration: appendBatch under a live foreign lease " +
    "refuses loudly, writes nothing, and the store keeps serving; " +
    "after the foreign lease expires the same append succeeds") {
    val corpus =
      java.nio.file.Files.createTempDirectory("lease_corpus").toString
    Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 400)
      .write.parquet(s"$corpus/embeddings.parquet")
    val idxDir = IndexStore.dirFor(spark, corpus)
    val (fs0, ip0) = graft.Scratch.fs(spark, idxDir)
    if (fs0.exists(ip0)) fs0.delete(ip0, true)
    val info = IndexStore.ensure(spark, corpus)
    assert(info.builtNow)
    val batch = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") >= 400 && col("vec_id") < 420)
    withDials(ttlMs = 60000, waitMs = 300) {
      writeForeign(idxDir, epoch = 5)
      intercept[LeaseHeldException] {
        IndexStore.appendBatch(spark, idxDir, batch)
      }
      // nothing landed: the delta dirs are untouched and meta still
      // counts the build-time corpus
      assert(IndexStore
        .deltaFileNames(spark, idxDir, "codes").isEmpty)
      val served = IndexStore.queryIvfPq(spark, corpus,
        IndexStore.BuildInfo(idxDir, info.n, info.nl, builtNow = false,
          buildSec = 0.0))
      assert(served.limit(1).count() == 1, "store stopped serving " +
        "after a refused append")
    }
    withDials(ttlMs = 400, waitMs = 300) {
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(idxDir))
      fs.setTimes(p, System.currentTimeMillis() - 5000, -1)
      val st = IndexStore.appendBatch(spark, idxDir, batch)
      assert(st.appended == 20,
        s"append after takeover appended ${st.appended}")
      assert(!exists(leaseFile(idxDir)), "lease not released")
    }
  }

  test("sink end-to-end: a docs-ingest batch whose lease is taken over " +
    "MID-SPAN (the paused-past-TTL holder) fails loudly, and the " +
    "checkpoint replay converges after restart") {
    // The GC-pause scenario (VERDICT r16 #7): a long driver pause can
    // outlast graft.lease.ttlMs (4 missed heartbeat renewals), a
    // contender then legitimately takes the lease over, and when the
    // paused batch RESUMES it must abort at its next fence — never
    // land the rest of its multi-write span over the new owner's
    // state. Forged here by overwriting the sink's live lease with a
    // foreign takeover line the moment the sink acquires it (the
    // post-pause world state, without needing a real pause); the
    // recovery contract is the streaming sink's own: loud batch
    // failure, checkpoint not advanced, replay converges.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDir = java.nio.file.Files
      .createTempDirectory("lease_sink_pause").toString + "/corpus"
    val lexDir = graft.operators.LexIndex.dirFor(spark, corpusDir)
    val ckpt = java.nio.file.Files
      .createTempDirectory("lease_sink_pause_ckpt").toString
    def mkDocs(lo: Int, hi: Int): Seq[(Long, String, String)] =
      (lo until hi).map(i => (i.toLong,
        s"document number $i carries enough distinct tokens " +
          s"alpha$i beta$i gamma$i delta$i to index and shingle",
        "en"))
    val ms = MemoryStream[(Long, String, String)]
    def startSink() = graft.streaming.StreamOps.incrementalIngestStream(
        ms.toDF().toDF("doc_id", "text", "lang"), corpusDir)
      .option("checkpointLocation", ckpt).start()
    val q1 = startSink()
    val stealer = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stole = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watcher = new Thread(() => {
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(corpusDir))
      while (!stole.get()) {
        if (stealer.get() && fs.exists(p)) {
          try {
            val line = new String(graft.Scratch.readSmallFile(fs, p),
              "UTF-8")
            if (!line.contains("foreign-owner")) {
              writeForeign(corpusDir, epoch = 99)
              stole.set(true)
            }
          } catch { case _: Throwable => () }
        }
        Thread.sleep(2)
      }
    }, "spec-lease-stealer")
    watcher.setDaemon(true)
    watcher.start()
    try {
      ms.addData(mkDocs(0, 40))
      q1.processAllAvailable() // bootstrap, unstolen
      stealer.set(true)
      ms.addData(mkDocs(40, 440)) // big batch: a multi-second span
      val failed =
        try { q1.processAllAvailable(); false }
        catch { case _: Throwable => true }
      assert(stole.get(), "the watcher never saw the sink's lease — " +
        "the forged takeover did not happen, the test proves nothing")
      assert(failed && q1.exception.isDefined,
        "a mid-span takeover must fail the batch LOUDLY (fence), " +
          "never complete it over the new owner's store")
      // the new owner's world: remove the forged lease (its holder is
      // this spec) and restart from the same checkpoint — the replay
      // re-delivers the failed batch and converges exactly once
      val (fs, p) = graft.Scratch.fs(spark, leaseFile(corpusDir))
      if (fs.exists(p)) fs.delete(p, false)
      val q2 = startSink()
      try {
        q2.processAllAvailable()
        assert(q2.exception.isEmpty, s"replay died: ${q2.exception}")
        val docs = spark.read.parquet(
          Generations.resolve(spark, corpusDir))
        val ids = docs.select("doc_id").as[Long].collect().sorted
        assert(ids.toSeq === (0L until 440L),
          "replay did not converge to exactly the fed documents")
        assert(docs.count() === 440L, "replay duplicated rows")
      } finally q2.stop()
    } finally {
      stole.set(true) // stop the watcher either way
      try q1.stop() catch { case _: Throwable => () }
      Seq(lexDir).foreach { d =>
        val (fs, p) = graft.Scratch.fs(spark, d)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }
}
