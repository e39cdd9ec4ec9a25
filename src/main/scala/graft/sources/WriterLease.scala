package graft.sources

import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Another live writer holds the store's lease and the bounded wait
  * expired — the caller must back off and retry (or escalate), never
  * proceed. */
final class LeaseHeldException(msg: String)
  extends IllegalStateException(msg)

/** This writer's lease was taken over (its process looked dead past
  * the TTL) and a commit point re-verified AFTER the takeover — the
  * mutation must abort. Everything written so far is, by the stores'
  * own crash discipline, exactly a crash state the new owner's
  * ensure/heal paths repair. */
final class StaleWriterException(msg: String)
  extends IllegalStateException(msg)

/** Cross-process writer lease + fencing for the persisted stores.
  *
  * Every persisted store here (the ANN index, the veclists screen
  * store, the lexical index, the ingest dedup indexes) documents the
  * same concurrency contract: ONE writer per store at a time, readers
  * free, external serialization assumed (IndexStore scaladoc
  * "Concurrency contract", SqlSink.append's single-writer note). The
  * reference inherits that contract from SQL Server — its writes are
  * statements inside a database that arbitrates them
  * (reference df_to_azure/db.py:36-53 just emits SQL); a parquet store
  * has no arbiter, so at 100 TB — where a streaming ingest sink, a
  * nightly compaction, and a retention delete are three DIFFERENT
  * driver JVMs — "assumed" must become "enforced". This object is
  * that arbiter, built from the only primitives a Hadoop FileSystem
  * offers:
  *
  *  - MUTUAL EXCLUSION (live writers): the lease is a sibling FILE
  *    `<storeDir>__lease` created with create-exclusive (atomic
  *    O_EXCL via java.nio on `file:` — Hadoop's RawLocalFileSystem
  *    create(overwrite=false) is check-then-create, NOT atomic — and
  *    `fs.create(p, false)` on HDFS/object stores, where it is). A
  *    second writer waits up to `waitMs` (contention between a
  *    per-batch sink and a compaction is transient — bounded waiting
  *    IS the serialization the contract used to outsource), then
  *    throws [[LeaseHeldException]] loudly.
  *  - CRASH TAKEOVER: the holder's daemon heartbeat renews the lease
  *    file's mtime every ttl/4; a lease whose mtime is older than
  *    `ttlMs` is dead. Takeover renames it aside (rename is atomic on
  *    both local and HDFS, so exactly ONE contending taker wins) and
  *    re-creates it with the fencing epoch bumped.
  *  - FENCING (resurrected writers): a paused-not-dead writer that
  *    resumes after its lease was taken must not land a stale commit.
  *    Every store mutation calls [[verify]] immediately before each
  *    VISIBLE write (shadow promote, meta swap, commit marker,
  *    tombstone append) — if the lease file no longer carries this
  *    JVM's owner id, the mutation aborts with
  *    [[StaleWriterException]] BEFORE the write; the partial state it
  *    leaves is by construction one of the store's healable crash
  *    windows. The heartbeat also re-reads the content and POISONS
  *    the handle the moment it stops being ours, so a long-running
  *    job usually fences at the next heartbeat, not the next commit.
  *
  * HONESTY: a filesystem cannot check a fencing token inside the
  * write itself, so a writer that pauses BETWEEN its verify and the
  * one rename/create that follows can still land one stale file.
  * That residue is exactly the "foreign write" class the stores
  * already defend against: every serving path trusts state only
  * through listings digests (name|length|mtime — [[graft.operators
  * .IndexStore]] stateDigest / the v2 `_commit` marker / the lists
  * marker), so a slipped stale write invalidates the tokens, forces
  * the full validation, and converges by rebuild — never silent
  * wrong answers. The lease narrows the corruption window from
  * "whole overlapping mutations" to "one pre-verified rename", and
  * the validation layer was always the backstop for that rename.
  *
  * The lease file lives OUTSIDE the store dir (sibling suffix, like
  * the `__shadow_`/`__old` family) deliberately: it survives the
  * store's own shadow-promote swap, and it never feeds
  * stateDigest/annListing — heartbeat mtime renewals must not
  * invalidate validation tokens every ttl/4.
  *
  * In-JVM, the stores already serialize mutators on the IndexStore
  * lock; [[withWrite]] is reentrant per (JVM, store) so composed
  * operations (ensure→build, deleteDocs→rewrite, pipeline steps)
  * acquire once at the top. Acquire only happens when a mutation is
  * actually about to run — read/validate paths never contend. */
object WriterLease {

  /** Lease liveness TTL. A holder missing `ttlMs` of heartbeats
    * (ttl/4 cadence ⇒ 4 consecutive misses) is presumed dead. */
  def ttlMs: Long =
    java.lang.Long.getLong("graft.lease.ttlMs", 120000L)

  /** Bounded wait for a HELD (live) lease before refusing. */
  def waitMs: Long =
    java.lang.Long.getLong("graft.lease.waitMs", 30000L)

  private val header = "graftlease|1"

  final case class Handle(dir: String, leasePath: String,
      ownerId: String, epoch: Long, op: String) {
    @volatile private[WriterLease] var poisoned: Boolean = false
    @volatile private[WriterLease] var depth: Int = 1
    @volatile private[WriterLease] var beat: Thread = null
    private[WriterLease] def line: String =
      s"$header|$epoch|$ownerId|$op"
  }

  /** JVM-wide registry of held leases, keyed by qualified store path.
    * Guarded by its own monitor: mutators of DIFFERENT stores may
    * hold leases concurrently (the streaming sinks maintain several
    * stores from different foreachBatch threads). */
  private val held =
    scala.collection.mutable.Map.empty[String, Handle]

  def leasePathOf(dir: String): String =
    dir.stripSuffix("/") + "__lease"

  private def resolve(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path,
        String) = {
    val (fs, p) = graft.Scratch.fs(spark, leasePathOf(dir))
    (fs, p, fs.makeQualified(p).toString)
  }

  /** Atomic-where-possible exclusive create. Returns false when the
    * path already exists (lost the race). */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(local, content.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.contains("already exists") => false
      }
    }
  }

  /** (epoch, ownerId, op) of a lease file; None when unreadable /
    * unparsable — callers treat that as "held by unknown" and lean on
    * mtime expiry alone (conservative: a garbled lease still blocks
    * until TTL). */
  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(Long, String, String)] =
    try {
      val parts = new String(graft.Scratch.readSmallFile(fs, p),
        "UTF-8").trim.split('|')
      if (parts.length == 5 && s"${parts(0)}|${parts(1)}" == header)
        Some((parts(2).toLong, parts(3), parts(4)))
      else None
    } catch { case NonFatal(_) => None }

  /** Run `body` holding the writer lease of `dir` (acquiring it, or
    * reentering the one this JVM already holds). Acquisition waits a
    * bounded `waitMs` for a LIVE holder, takes over an EXPIRED one
    * with the epoch bumped, and throws [[LeaseHeldException]] when
    * the wait runs out. The lease is released (file deleted if still
    * ours) on every exit path; a body failure therefore frees the
    * store immediately — the partial state is a crash window the next
    * writer's heal paths repair. */
  def withWrite[T](spark: SparkSession, dir: String, op: String)
      (body: => T): T = {
    val (fs, p, key) = resolve(spark, dir)
    val reenter = held.synchronized {
      held.get(key) match {
        case Some(h) => h.depth += 1; true
        case None => false
      }
    }
    if (reenter) {
      try body
      finally held.synchronized(held.get(key).foreach(_.depth -= 1))
    } else {
      val h = acquire(fs, p, key, op)
      try body
      finally release(fs, p, key, h)
    }
  }

  private def acquire(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, key: String, op: String): Handle = {
    val deadline = System.currentTimeMillis() + waitMs
    val ownerId = java.util.UUID.randomUUID().toString
    var h: Handle = null
    while (h == null) {
      val st =
        try Some(fs.getFileStatus(p))
        catch { case _: java.io.FileNotFoundException => None }
      val now = System.currentTimeMillis()
      st match {
        case Some(s) if now - s.getModificationTime <= ttlMs =>
          // live holder — bounded wait, then refuse loudly
          if (now >= deadline) {
            val who = readLease(fs, p)
              .map { case (e, o, wop) => s"epoch=$e owner=$o op=$wop" }
              .getOrElse("unreadable lease")
            throw new LeaseHeldException(
              s"store at ${key.stripSuffix("__lease")} is held by a " +
                s"live writer ($who, renewed " +
                s"${now - s.getModificationTime} ms ago) — waited " +
                s"${waitMs} ms; serialize writers or raise " +
                "-Dgraft.lease.waitMs")
          }
          Thread.sleep(250)
        case Some(s) =>
          // expired — take over: exactly one contender wins the rename
          val prevEpoch = readLease(fs, p).map(_._1).getOrElse(0L)
          val aside = new org.apache.hadoop.fs.Path(
            s"$key.stale.${ownerId.take(8)}")
          if (try fs.rename(p, aside) catch { case NonFatal(_) => false }) {
            try fs.delete(aside, false)
            catch { case NonFatal(_) => () }
            val cand = Handle(key.stripSuffix("__lease"), key, ownerId,
              prevEpoch + 1, op)
            if (createExclusive(fs, p, cand.line)) h = cand
            // lost the post-rename create race — loop re-evaluates
          }
          // lost the rename race — loop re-evaluates the new holder
        case None =>
          val cand = Handle(key.stripSuffix("__lease"), key, ownerId,
            1L, op)
          if (createExclusive(fs, p, cand.line)) h = cand
      }
    }
    held.synchronized(held.put(key, h))
    startHeartbeat(fs, p, h)
    h
  }

  /** Renew mtime every ttl/4; poison the handle the moment the lease
    * file stops carrying our line (fenced) or renewal keeps failing.
    * Daemon thread — dies with the JVM, which is what lets the TTL
    * takeover see a crashed holder. */
  private def startHeartbeat(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, h: Handle): Unit = {
    val t = new Thread(() => {
      val period = math.max(50L, ttlMs / 4)
      var live = true
      while (live && !h.poisoned) {
        try Thread.sleep(period)
        catch { case _: InterruptedException => live = false }
        if (live && !h.poisoned) {
          try {
            val ours = readLease(fs, p)
              .exists { case (e, o, _) => e == h.epoch && o == h.ownerId }
            if (!ours) h.poisoned = true
            else fs.setTimes(p, System.currentTimeMillis(), -1)
          } catch {
            case NonFatal(_) => () // transient FS hiccup: mtime keeps
            // its last value; ttl/4 cadence gives 4 tries before expiry
          }
        }
      }
    }, s"graft-lease-${h.ownerId.take(8)}")
    t.setDaemon(true)
    h.beat = t
    t.start()
  }

  private def release(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, key: String, h: Handle): Unit = {
    held.synchronized(held.remove(key))
    h.poisoned = true
    Option(h.beat).foreach(_.interrupt())
    try {
      val ours = readLease(fs, p)
        .exists { case (e, o, _) => e == h.epoch && o == h.ownerId }
      if (ours) fs.delete(p, false)
    } catch { case NonFatal(_) => () }
  }

  /** Commit-point fence: throw [[StaleWriterException]] when this
    * JVM's lease on `dir` was lost. No-op when this JVM holds no
    * lease for `dir` — internal callers (heal paths invoked from
    * serving reads, specs forging states) mutate under the stores'
    * own crash discipline without a lease; every PUBLIC mutator
    * acquires, so production writes are always fenced. */
  def verify(spark: SparkSession, dir: String): Unit = {
    val (fs, p, key) = resolve(spark, dir)
    val h = held.synchronized(held.get(key)).getOrElse(return)
    val ours = !h.poisoned &&
      (try readLease(fs, p)
        .exists { case (e, o, _) => e == h.epoch && o == h.ownerId }
      catch { case NonFatal(_) => false })
    if (!ours) {
      h.poisoned = true
      throw new StaleWriterException(
        s"writer lease on $dir (epoch ${h.epoch}, op ${h.op}) was " +
          "taken over — this writer looked dead past the TTL; " +
          "aborting before the commit write (the partial state is a " +
          "standard crash window the new owner's ensure/heal repairs)")
    }
  }

  /** Fencing epoch of the lease this JVM holds on `dir` (specs and
    * diagnostics). */
  def heldEpoch(spark: SparkSession, dir: String): Option[Long] = {
    val (_, _, key) = resolve(spark, dir)
    held.synchronized(held.get(key)).map(_.epoch)
  }
}
