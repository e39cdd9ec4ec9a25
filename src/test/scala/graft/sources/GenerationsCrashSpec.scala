package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kill-point sweep over the retained-generation commit sequence
  * (VERDICT r17 #6): a writer can die at any point of
  * shadow-write → rename → `_committed` stamp → GC, with a reader
  * and a GC interleaved at every stage. The targeted GenerationsSpec
  * tests pin single scenarios; this spec ENUMERATES the kill points
  * (deterministic enumeration beats sampling here — the state space
  * is four kill points × three observation stages, all forged
  * on-disk exactly as WriterLeaseSpec forges takeovers) and asserts
  * the three invariants at every stage:
  *
  *   I1 READER NEVER SEES A MIX — a resolving reader's row set is
  *      exactly ONE complete generation's content (old or new, never
  *      a blend), and a reader that PLANNED its splits before the
  *      kill still finds every planned file byte-present until TTL;
  *   I2 BOUNDED DEBRIS — past the TTL, GC leaves at most the live
  *      generation (plus the in-flight shadow only for kills BEFORE
  *      the rename, aged by its own TTL);
  *   I3 NO COMMITTED ROW LOST — content committed by a completed
  *      rename survives every kill and every GC; content whose
  *      rename never ran is still fully present in the PREVIOUS
  *      generation (the crash loses the rewrite attempt, never data).
  *
  * The store-kind integrations (ANN delta fold sentinel, lex/corpus
  * rewrites) ride this same substrate and pin their own crash
  * windows in IndexStoreSpec/GenerationsSpec — this sweep is the
  * substrate's own contract. */
class GenerationsCrashSpec extends SparkSpec {

  import spark.implicits._

  private def writeTable(n: Int, parts: Int): String = {
    val dir = Files.createTempDirectory("graft_genfuzz").toString + "/t"
    spark.range(n).select(col("id"), (col("id") % 7).as("v"))
      .repartition(parts).write.parquet(dir)
    dir
  }

  private def fsOf(dir: String) = graft.Scratch.fs(spark, dir)

  /** All data files a reader would plan splits over right now. */
  private def plannedFiles(dir: String): Seq[String] = {
    val cur = Generations.resolve(spark, dir)
    val (fs, p) = fsOf(cur)
    graft.Scratch.walkFiles(fs, new org.apache.hadoop.fs.Path(cur.toString))
      .map(_.getPath.toString)
      .filter(f => !f.contains("/_") && !f.contains("/."))
  }

  private def idsAt(dir: String): Set[Long] =
    spark.read.parquet(Generations.resolve(spark, dir))
      .select("id").as[Long].collect().toSet

  sealed trait Kill
  case object MidShadowWrite extends Kill   // shadow incomplete
  case object ShadowNoRename extends Kill   // shadow full, no rename
  case object RenamedNoStamp extends Kill   // gen live, no _committed
  case object Committed extends Kill        // full commit() ran

  test("kill-point sweep: reader never sees a mix, debris bounded " +
    "past TTL, no committed row lost, recovery converges — at every " +
    "kill point, with a reader and GC interleaved") {
    for (kill <- Seq(MidShadowWrite, ShadowNoRename, RenamedNoStamp,
        Committed)) {
      val dir = writeTable(100, 4)
      val oldIds = idsAt(dir)
      val newIds = oldIds.filter(_ % 7 != 0)
      val planned = plannedFiles(dir) // a reader's splits, pre-kill
      try {
        // --- the dying writer, up to its kill point -----------------
        val shadow = Generations.shadowFor(spark, dir)
        spark.read.parquet(dir).filter(col("v") =!= 0)
          .repartition(2).write.parquet(shadow)
        val (fs, shadowP) = fsOf(shadow)
        kill match {
          case MidShadowWrite =>
            // lose one shadow data file — the torn-write state
            val f = graft.Scratch.walkFiles(fs, shadowP)
              .map(_.getPath).find(_.getName.endsWith(".parquet")).get
            fs.delete(f, false)
          case ShadowNoRename => ()
          case RenamedNoStamp =>
            // commit's rename without its _committed stamp
            val target = new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(dir), "_gen_1")
            assert(fs.rename(shadowP, target))
          case Committed =>
            Generations.commit(spark, dir, shadow)
        }

        val renamed = kill == RenamedNoStamp || kill == Committed

        // --- I1: resolving reader sees ONE complete generation ------
        val seen = idsAt(dir)
        assert(seen == oldIds || seen == newIds,
          s"$kill: reader saw a MIX (${seen.size} rows; old " +
            s"${oldIds.size}, new ${newIds.size})")
        if (renamed) assert(seen == newIds,
          s"$kill: rename completed but reader still resolves old")
        else assert(seen == oldIds,
          s"$kill: rename never ran but reader left the old generation")

        // planned splits stay byte-present within the TTL (default
        // 30 min — no reap can have run)
        planned.foreach { f =>
          val (pfs, pp) = fsOf(f)
          assert(pfs.exists(pp),
            s"$kill: planned split $f vanished inside the TTL")
        }

        // --- GC inside the TTL: touches nothing the reader holds ----
        Generations.gc(spark, dir)
        assert(idsAt(dir) === seen, s"$kill: in-TTL GC moved the table")
        planned.foreach { f =>
          val (pfs, pp) = fsOf(f)
          assert(pfs.exists(pp), s"$kill: in-TTL GC reaped a planned split")
        }

        // --- GC past the TTL: debris bounded, committed rows kept ---
        spark.conf.set("spark.graft.gen.ttlMs", "0")
        try {
          Generations.gc(spark, dir)
          assert(idsAt(dir) === seen,
            s"$kill: post-TTL GC changed the served content")
          val (rfs, rp) = fsOf(dir)
          val entries = rfs.listStatus(rp).map(_.getPath.getName)
          assert(!entries.exists(_.startsWith(".gen_tmp_")),
            s"$kill: post-TTL GC left shadow debris")
          if (renamed)
            assert(!entries.exists(_.endsWith(".parquet")),
              s"$kill: retired generation-0 files survived TTL-0 GC")
        } finally spark.conf.unset("spark.graft.gen.ttlMs")

        // --- I3 + recovery: the next writer's full rewrite converges
        val shadow2 = Generations.shadowFor(spark, dir)
        spark.read.parquet(Generations.resolve(spark, dir))
          .filter(col("v") =!= 0)
          .repartition(1).write.parquet(shadow2)
        Generations.commit(spark, dir, shadow2)
        assert(idsAt(dir) === newIds,
          s"$kill: recovery rewrite did not converge to the survivors")
      } finally {
        val (fs, p) = fsOf(dir)
        val parent = new org.apache.hadoop.fs.Path(dir).getParent
        if (fs.exists(parent)) fs.delete(parent, true)
      }
    }
  }

  test("kill between a reader's resolve and its read: the resolved " +
    "generation stays fully readable across a concurrent commit and " +
    "an in-TTL GC (the planned-splits contract, driver-side form)") {
    val dir = writeTable(60, 3)
    try {
      // reader resolves FIRST (plans its scan)...
      val plannedGen = Generations.resolve(spark, dir)
      val plannedCount = spark.read.parquet(plannedGen).count()
      // ...then a full rewrite commits TWICE (two new generations),
      // each followed by an in-TTL GC
      (1 to 2).foreach { i =>
        val sh = Generations.shadowFor(spark, dir)
        spark.read.parquet(Generations.resolve(spark, dir))
          .filter(col("id") =!= lit(i))
          .repartition(1).write.parquet(sh)
        Generations.commit(spark, dir, sh) // gc piggybacks
      }
      // the reader's planned generation still serves, complete
      assert(spark.read.parquet(plannedGen).count() === plannedCount,
        "a planned-and-still-in-TTL generation lost rows under " +
          "back-to-back commits")
    } finally {
      val (fs, _) = fsOf(dir)
      fs.delete(new org.apache.hadoop.fs.Path(dir).getParent, true)
    }
  }
}
