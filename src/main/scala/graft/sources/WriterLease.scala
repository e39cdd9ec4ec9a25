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
  *    `fs.create(p, false)` elsewhere: atomic on HDFS, advisory on
  *    S3-like stores; see FILESYSTEM HONESTY below). A
  *    second writer waits up to `waitMs` (contention between a
  *    per-batch sink and a compaction is transient — bounded waiting
  *    IS the serialization the contract used to outsource), then
  *    throws [[LeaseHeldException]] loudly.
  *  - CRASH TAKEOVER: the holder's daemon heartbeat renews the lease
  *    file's mtime every ttl/4 (rewriting the object where setTimes
  *    is unsupported); a lease whose mtime is older than `ttlMs` is
  *    dead. Takeover renames it aside (atomic on local and HDFS, so
  *    exactly ONE contending taker wins there) and re-creates it with
  *    the fencing epoch bumped.
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
  * FILESYSTEM HONESTY: the mutual-exclusion primitive is atomic
  * create-exclusive/rename — real on local (O_EXCL) and HDFS, NOT on
  * S3-like object stores, whose create(overwrite=false) is
  * check-then-PUT and whose rename is copy+delete (and which often
  * reject setTimes — the heartbeat falls back to rewriting the lease
  * object, whose fresh timestamp is the renewal). On such stores the
  * lease degrades to ADVISORY plus the validation backstop above; a
  * deployment there should point the lease at a coordination-capable
  * path (HDFS/NFS) or swap this object's primitives for conditional
  * PUTs. Same trust ladder as everywhere here: prevent where the
  * primitive is real, detect-and-heal where it is not.
  *
  * EPOCH-IN-MARKERS (design decision, VERDICT r15 #8 — scoped, NOT
  * implemented): stamping the fencing epoch into the commit markers
  * (`_commit`, vtoken, ingest marker) and checking monotonicity at
  * validation would upgrade the object-store story from "foreign
  * write detected by digest" to "stale writer identified by epoch".
  * Scoping found the check needs a SECOND durable primitive the
  * stores don't otherwise have: the epoch's source of truth is the
  * lease FILE, which is deleted on release — a validator arriving
  * with no live lease has nothing to compare a marker's stamp
  * against, so monotonicity requires a persistent per-store epoch
  * high-water file that every acquisition reads and every takeover
  * rewrites. That file's own writes are exactly as non-atomic on an
  * object store as the lease's (a torn high-water rewrite yields
  * false "stale writer" verdicts on healthy stores — worse than the
  * digest's honest "something moved, revalidate"), and the digest
  * backstop already converges to a correct answer in every such
  * window at zero extra I/O. Decision: keep detect-and-heal; the
  * epoch stamp buys a better diagnostic label, not a smaller
  * corruption window, and its new failure mode is not worth that
  * label. Revisit only alongside real conditional-PUT primitives
  * (which would fix the lease itself first).
  *
  * The lease file lives OUTSIDE the store dir (sibling suffix, like
  * the `__shadow_`/`__old` family) deliberately: it survives the
  * store's own shadow-promote swap, and it never feeds
  * stateDigest/annListing — heartbeat mtime renewals must not
  * invalidate validation tokens every ttl/4.
  *
  * In-JVM: [[withWrite]] is reentrant PER THREAD (composed
  * operations — ensure→build, deleteDocs→rewrite, pipeline steps —
  * acquire once at the top of their own stack) and SERIALIZES other
  * threads of the same JVM on the same store through the registry
  * (bounded wait, then the same loud [[LeaseHeldException]]) — the
  * store monitors no longer have to be the only in-process writer
  * arbiter, which matters for the public unsynchronized mutators
  * (IndexStore.build, Maintenance.compactIngestIndexes). Lock
  * ordering: the per-batch public mutators take lease → store
  * monitor (so a foreign holder's bounded wait never blocks the
  * monitor that serves readers); the composed ensure paths take
  * monitor → lease when they decide to mutate. A cross-thread
  * collision between the two orders cannot deadlock past `waitMs` —
  * the lease side throws loudly and releases. Acquire only happens
  * when a mutation is actually about to run — read/validate paths
  * never contend. */
object WriterLease {

  /** Lease liveness TTL. A holder missing `ttlMs` of heartbeats
    * (ttl/4 cadence ⇒ 4 consecutive misses) is presumed dead.
    *
    * SIZING (VERDICT r16 #7): the heartbeat is a daemon thread, so
    * the one legitimate way a LIVE holder misses 4 renewals is a
    * whole-JVM stall — a driver full-GC pause, a VM freeze. Size the
    * TTL ABOVE the worst pause your heap can produce (a 100 TB
    * driver with a large old gen can pause tens of seconds; the
    * 120 s default absorbs that, a small-heap test JVM can run far
    * lower). The discipline stays SAFE when mis-sized — a takeover
    * during a pause poisons the sleeper's handle and its next fence
    * aborts the batch loudly (WriterLeaseSpec's sink end-to-end test
    * pins batch-fails-loudly + checkpoint-replay-converges) — but
    * every such event turns one pause into one aborted-and-replayed
    * batch, so a TTL below the real pause ceiling trades availability,
    * never correctness. */
  def ttlMs: Long =
    java.lang.Long.getLong("graft.lease.ttlMs", 120000L)

  /** Bounded wait for a HELD (live) lease before refusing. */
  def waitMs: Long =
    java.lang.Long.getLong("graft.lease.waitMs", 30000L)

  private val header = "graftlease|1"

  final case class Handle(dir: String, leasePath: String,
      ownerId: String, op: String, ownerThread: Thread) {
    // epoch is assigned by the filesystem acquisition (takeover reads
    // the dead holder's); the handle registers BEFORE that as the
    // in-JVM reservation, so other threads already queue on it
    @volatile private[WriterLease] var epoch: Long = 0L
    @volatile private[WriterLease] var poisoned: Boolean = false
    @volatile private[WriterLease] var beat: Thread = null
    private[WriterLease] def line: String =
      s"$header|$epoch|$ownerId|$op"
  }

  /** JVM-wide registry of held (or being-acquired) leases, keyed by
    * qualified store path. Guarded by its own monitor: mutators of
    * DIFFERENT stores may hold leases concurrently (the streaming
    * sinks maintain several stores from different foreachBatch
    * threads); a SECOND thread on the SAME store queues here with the
    * same bounded wait as a second process. */
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

  /** ONE attempt at "does the lease file still carry `h`'s line?" —
    * the shared probe of the heartbeat, [[verify]] and [[release]],
    * so all three judge ownership identically:
    *  - Some(true): parsed line matches (epoch + owner id), or the
    *    line is torn mid-rewrite but OUR acquisition uuid is legible
    *    in the raw bytes (the object-store heartbeat RENEWS by
    *    non-atomic rewrite — a reader racing it sees a torn file of
    *    our own making; uuids are per-acquisition, so a legible uuid
    *    identifies this very handle).
    *  - Some(false): file confirmed missing, or a parsed line that is
    *    someone else's — a takeover happened.
    *  - None: unreadable THIS attempt (transient FS error, or torn
    *    bytes without our uuid — possibly a foreign takeover
    *    mid-write); the caller retries or tolerates, it must not
    *    fence on one bad read (ADVICE-class: the heartbeat tolerates
    *    4 missed renewals before TTL expiry; a fence that tolerates
    *    zero failed reads poisons healthy writers on FS hiccups). */
  private def oursNow(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, h: Handle): Option[Boolean] =
    try {
      if (!fs.exists(p)) Some(false)
      else readLease(fs, p) match {
        case Some((e, o, _)) => Some(e == h.epoch && o == h.ownerId)
        case None =>
          val raw =
            try new String(graft.Scratch.readSmallFile(fs, p), "UTF-8")
            catch { case NonFatal(_) => "" }
          if (raw.contains(h.ownerId)) Some(true) else None
      }
    } catch { case NonFatal(_) => None }

  /** [[oursNow]] retried a few times; None when every attempt was
    * unreadable. */
  private def oursRetried(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, h: Handle,
      attempts: Int = 3): Option[Boolean] = {
    var left = attempts
    while (left > 0) {
      oursNow(fs, p, h) match {
        case s @ Some(_) => return s
        case None => left -= 1; if (left > 0) Thread.sleep(100)
      }
    }
    None
  }

  /** Run `body` holding the writer lease of `dir` (acquiring it, or
    * reentering the one this THREAD already holds — a nested call is
    * strictly LIFO on one stack, so no counting is needed). A second
    * thread of this JVM queues on the registry with the same bounded
    * wait a second process pays at the file. Acquisition waits a
    * bounded `waitMs` for a LIVE holder, takes over an EXPIRED one
    * with the epoch bumped, and throws [[LeaseHeldException]] when
    * the wait runs out. The lease is released (file deleted if still
    * ours) on every exit path; a body failure therefore frees the
    * store immediately — the partial state is a crash window the next
    * writer's heal paths repair. */
  def withWrite[T](spark: SparkSession, dir: String, op: String)
      (body: => T): T = {
    val (fs, p, key) = resolve(spark, dir)
    val self = Thread.currentThread()
    val deadline = System.currentTimeMillis() + waitMs
    var h: Handle = null
    var reenter = false
    while (h == null) {
      held.synchronized {
        held.get(key) match {
          case Some(e) if e.ownerThread eq self =>
            h = e; reenter = true
          case Some(_) => () // another thread — wait outside the lock
          case None =>
            // reserve in-JVM before touching the filesystem, so a
            // second thread queues here instead of double-acquiring
            h = Handle(key.stripSuffix("__lease"), key,
              java.util.UUID.randomUUID().toString, op, self)
            held.put(key, h)
        }
      }
      if (h == null) {
        if (System.currentTimeMillis() >= deadline)
          throw new LeaseHeldException(
            s"store at ${key.stripSuffix("__lease")} is held by " +
              s"another writer thread of this process — waited " +
              s"${waitMs} ms; serialize writers or raise " +
              "-Dgraft.lease.waitMs")
        Thread.sleep(100)
      }
    }
    if (reenter) body
    else {
      try acquire(fs, p, key, h, deadline)
      catch { case t: Throwable =>
        held.synchronized(held.remove(key)); throw t
      }
      try body
      finally release(fs, p, key, h)
    }
  }

  private def acquire(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, key: String, h: Handle,
      deadline: Long): Unit = {
    var done = false
    while (!done) {
      val st =
        try Some(fs.getFileStatus(p))
        catch { case _: java.io.FileNotFoundException => None }
      val now = System.currentTimeMillis()
      def refuse(why: String): Nothing =
        throw new LeaseHeldException(
          s"store at ${key.stripSuffix("__lease")} $why — waited " +
            s"${waitMs} ms; serialize writers or raise " +
            "-Dgraft.lease.waitMs")
      st match {
        case Some(s) if now - s.getModificationTime <= ttlMs =>
          // live holder — bounded wait, then refuse loudly
          if (now >= deadline) {
            val who = readLease(fs, p)
              .map { case (e, o, wop) => s"epoch=$e owner=$o op=$wop" }
              .getOrElse("unreadable lease")
            refuse(s"is held by a live writer ($who, renewed " +
              s"${now - s.getModificationTime} ms ago)")
          }
          Thread.sleep(250)
        case Some(s) =>
          // expired — take over: exactly one contender wins the rename
          val prevEpoch = readLease(fs, p).map(_._1).getOrElse(0L)
          val aside = new org.apache.hadoop.fs.Path(
            s"$key.stale.${h.ownerId.take(8)}")
          if (try fs.rename(p, aside) catch { case NonFatal(_) => false }) {
            try fs.delete(aside, false)
            catch { case NonFatal(_) => () }
            h.epoch = prevEpoch + 1
            if (createExclusive(fs, p, h.line)) done = true
          }
          // lost the rename / post-rename create race, or the rename
          // itself keeps failing (read-only mount, store quirk): the
          // deadline bounds the loop — never a busy-spin — and the
          // sleep paces the retries
          if (!done) {
            if (now >= deadline)
              refuse("has an expired lease this writer could not take " +
                "over (rename/create kept failing or losing races)")
            Thread.sleep(250)
          }
        case None =>
          h.epoch = 1L
          if (createExclusive(fs, p, h.line)) done = true
          else if (now >= deadline)
            refuse("could not be acquired (create-exclusive kept " +
              "losing races)")
          // lost the create race — loop re-evaluates the new holder
      }
    }
    startHeartbeat(fs, p, h)
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
            // oursNow: a torn read (our own object-store renewal
            // rewrite, a transient FS error) is None → tolerated like
            // a missed renewal, NOT a takeover verdict; only a
            // CONFIRMED foreign/missing line poisons
            oursNow(fs, p, h) match {
              case Some(false) => h.poisoned = true
              case None => () // unreadable — ttl/4 cadence retries
              case Some(true) =>
                try fs.setTimes(p, System.currentTimeMillis(), -1)
                catch {
                  case _: UnsupportedOperationException =>
                    // object stores reject setTimes — rewrite the
                    // lease object instead; its fresh timestamp IS
                    // the renewal (non-atomic overwrite, but an
                    // unreadable mid-write lease reads as
                    // held-by-unknown under mtime expiry —
                    // conservative)
                    val out = fs.create(p, true)
                    try out.write(h.line.getBytes("UTF-8"))
                    finally out.close()
                }
            }
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
    // A transient read/delete hiccup here must not orphan OUR live
    // lease file: the heartbeat is already stopped, so a left-behind
    // file blocks every subsequent writer (any JVM) for a full TTL
    // even though the store is free (ADVICE r15). [[oursRetried]]
    // retries the ours-check (with the torn-rewrite raw-uuid
    // fallback); a confirmed-ours line is deleted, a confirmed
    // foreign/missing one is left, and a persistently unreadable one
    // is left too (never delete a possibly-foreign lease — if it was
    // ours it expires by TTL and a later writer takes over).
    oursRetried(fs, p, h) match {
      case Some(true) =>
        try fs.delete(p, false)
        catch { case NonFatal(_) =>
          // delete itself hiccuped — one more try, then the TTL rule
          try { Thread.sleep(100); fs.delete(p, false) }
          catch { case NonFatal(_) =>
            System.err.println(s"[lease] release of $key could not " +
              "delete our lease file — it expires by TTL")
          }
        }
      case Some(false) => () // no longer ours — the new owner's file
      case None =>
        System.err.println(s"[lease] release of $key could not " +
          "confirm ownership after retries — if the file is ours it " +
          "expires by TTL (a later writer takes over); never " +
          "deleting a possibly-foreign lease")
    }
  }

  /** [[withWrite]] with PATIENCE for the long-holder case: a corpus
    * rewrite (retention delete, compaction) is O(corpus) and can
    * legitimately outlast one `waitMs` window, and the per-batch
    * ingest sinks are the callers that meet it. Retries the bounded
    * wait up to `graft.lease.ingestAttempts` times (default 4 ⇒ ~2 min
    * of total patience at the default wait) before letting the
    * [[LeaseHeldException]] fly. A genuinely longer hold still fails
    * the batch loudly — and a failed streaming batch is RECOVERABLE
    * by design: the sinks are checkpoint-replay idempotent, so a
    * query restart replays the batch against the by-then-released
    * store. */
  def withWritePatient[T](spark: SparkSession, dir: String, op: String)
      (body: => T): T = {
    val attempts = math.max(1,
      Integer.getInteger("graft.lease.ingestAttempts", 4))
    var left = attempts
    while (true) {
      left -= 1
      try return withWrite(spark, dir, op)(body)
      catch {
        case e: LeaseHeldException if left > 0 =>
          System.err.println(s"[lease] $op on $dir: holder outlasted " +
            s"one wait window ($left retries left): ${e.getMessage}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit-point fence: throw [[StaleWriterException]] when this
    * JVM's lease on `dir` was lost. No-op when this JVM holds no
    * lease for `dir` — internal callers (heal paths invoked from
    * serving reads, specs forging states) mutate under the stores'
    * own crash discipline without a lease; every PUBLIC mutator
    * acquires, so production writes are always fenced.
    *
    * Scoped to THIS THREAD's completed acquisition (ADVICE r15):
    * commit-point fences always run on the acquiring thread (the
    * withWrite body), so a handle owned by ANOTHER thread — or one
    * registered as the in-JVM reservation but still inside the
    * bounded wait on a foreign holder (epoch == 0) — is none of this
    * caller's business. Without the scoping, a lease-less heal/serve
    * path calling verify during a sibling thread's acquisition window
    * would read the foreign holder's line, POISON the acquiring
    * thread's handle, and throw from a thread holding nothing —
    * spuriously aborting both. */
  def verify(spark: SparkSession, dir: String): Unit = {
    val (fs, p, key) = resolve(spark, dir)
    val h = held.synchronized(held.get(key)) match {
      case Some(x)
          if (x.ownerThread eq Thread.currentThread()) && x.epoch != 0L =>
        x
      case _ => return
    }
    if (h.poisoned)
      throw new StaleWriterException(
        s"writer lease on $dir (epoch ${h.epoch}, op ${h.op}) was " +
          "taken over — this writer looked dead past the TTL; " +
          "aborting before the commit write (the partial state is a " +
          "standard crash window the new owner's ensure/heal repairs)")
    // oursRetried, not a single read: one transient FS hiccup (or a
    // torn racing heartbeat rewrite on an object store) must not
    // misdiagnose a LIVE writer as fenced and kill its whole span —
    // the heartbeat tolerates 4 missed renewals before TTL expiry,
    // so a fence tolerating zero failed reads would be strictly
    // jumpier than the liveness authority it fronts for. A
    // persistently-unreadable line with an unpoisoned handle is
    // trusted (the heartbeat keeps watching at ttl/4 cadence and
    // poisons on any CONFIRMED foreign line).
    oursRetried(fs, p, h) match {
      case Some(true) => ()
      case Some(false) =>
        h.poisoned = true
        throw new StaleWriterException(
          s"writer lease on $dir (epoch ${h.epoch}, op ${h.op}) was " +
            "taken over — this writer looked dead past the TTL; " +
            "aborting before the commit write (the partial state is " +
            "a standard crash window the new owner's ensure/heal " +
            "repairs)")
      case None =>
        System.err.println(s"[lease] verify on $dir: lease file " +
          "unreadable after retries — trusting the live heartbeat " +
          "(it poisons on any confirmed takeover)")
    }
  }

  /** Fencing epoch of the lease this JVM holds on `dir` (specs and
    * diagnostics). */
  def heldEpoch(spark: SparkSession, dir: String): Option[Long] = {
    val (_, _, key) = resolve(spark, dir)
    held.synchronized(held.get(key)).map(_.epoch)
  }
}
