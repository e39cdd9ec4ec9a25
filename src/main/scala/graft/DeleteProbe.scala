package graft

import org.apache.spark.sql.functions._

/** Deletion-lifecycle cost probe at scale: on a standing corpus+index,
  * time (a) deleteBatch (tombstone stamp + corpus rewrite), (b) the
  * next ensure (folded validation — must NOT rebuild when the kill
  * stays inside the nlist boundary), (c) a post-delete serve, (d) the
  * compaction fold, (e) the post-fold serve — and assert zero leaks at
  * every step. One JSON line.
  *
  *   sbt "runMain graft.DeleteProbe /tmp/sf64ann 142"
  *
  * killMod picks the kill set (vec_id % killMod == 3): size ≈ N/mod —
  * choose a mod that keeps nlistFor(survivors) == nlistFor(N) to
  * exercise the incremental (no-rebuild) path.
  *
  * Read-amplification leg (VERDICT r16 #6): `serve_clean_sec` times
  * the same serve BEFORE any tombstone exists, so
  * `serve_tombstoned_sec − serve_clean_sec` is the standing pre-fold
  * premium of the pending-tombstone anti-joins. Run it at two corpus
  * sizes with the SAME standing tombstone count (a fold threshold − 1,
  * the worst state a foldAtTombstones policy lets stand — the
  * `killCount` arg sizes the kill set directly) and the premium's N
  * dependence is a fitted number, not a one-off.
  *
  *   sbt "runMain graft.DeleteProbe /tmp/sf16ann count=255"
  */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: DeleteProbe <sfDir> [killMod | count=T]")
    val sfDir = args(0)
    val spark = GraftSession.local("graft-deleteprobe")
    import operators.IndexStore
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val info0 = IndexStore.ensure(spark, sfDir)
    // count=T sizes the kill set exactly (the standing-state leg);
    // a bare integer keeps the legacy killMod framing
    val killCount = args.drop(1).collectFirst {
      case a if a.startsWith("count=") => a.stripPrefix("count=").toLong
    }
    val killMod = killCount match {
      case Some(t) => math.max(2L, info0.n / math.max(1L, t))
      case None => if (args.length > 1) args(1).toLong else 142L
    }
    // residue must be satisfiable at small mods (3 % 2 == 3 never is —
    // a silently-empty kill set would emit killed=0 with meaningless
    // timings), and the probe refuses an empty set loudly either way
    val residue = 3L % killMod
    val kills = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % killMod === residue).select(col("vec_id"))
    val killSet = kills.collect().map(_.getLong(0)).toSet
    require(killSet.nonEmpty,
      s"kill set is empty (n=${info0.n}, killMod=$killMod) — nothing " +
        "to measure")
    import spark.implicits._
    // clean-serve baseline BEFORE any tombstone exists — the reference
    // the pre-fold premium is measured against (same plan, same host
    // window, zero pending tombstones). Median of 3: single serves at
    // probe scale swing under co-tenant steal.
    val serveCleanSec = {
      val ts = (1 to 3).map(_ => timed(
        IndexStore.queryIvfPq(spark, sfDir, info0).count())._2).sorted
      ts(1)
    }
    val (st, delSec) = timed(IndexStore.deleteBatch(spark, sfDir,
      killSet.toSeq.toDF("vec_id")))
    val (info1, ensSec) = timed(IndexStore.ensure(spark, sfDir))
    require(!info1.builtNow, "ensure rebuilt after an inside-boundary " +
      "delete — the folded validation is broken at this scale")
    def leakFree(tag: String): Double = {
      // median of 3, matching the clean baseline's basis
      val ts = (1 to 3).map { _ =>
        val (leaks, s) = timed(IndexStore.queryIvfPq(spark, sfDir, info1)
          .filter(col("neighbor_id").isin(killSet.toSeq: _*)).count())
        require(leaks == 0, s"$tag served $leaks deleted neighbor(s)")
        s
      }.sorted
      ts(1)
    }
    val serve1 = leakFree("pre-fold")
    val ((_, foldSec)) = timed(
      graft.sources.Maintenance.compactAnnIndex(spark,
        IndexStore.dirFor(spark, sfDir)))
    val (info2, ens2Sec) = timed(IndexStore.ensure(spark, sfDir))
    require(!info2.builtNow, "ensure rebuilt after the fold")
    val serve2 = leakFree("post-fold")
    def f(v: Double) = Json.f3(v)
    println(s"""{"probe":"deletescale","sf":${Json.str(sfDir)},""" +
      s""""n":${info0.n},"killed":${st.tombstoned},""" +
      s""""serve_clean_sec":${f(serveCleanSec)},""" +
      s""""delete_sec":${f(delSec)},"ensure_folded_sec":${f(ensSec)},""" +
      s""""serve_tombstoned_sec":${f(serve1)},"fold_sec":${f(foldSec)},""" +
      s""""ensure_postfold_sec":${f(ens2Sec)},""" +
      s""""serve_postfold_sec":${f(serve2)}}""")
    spark.stop()
  }
}
