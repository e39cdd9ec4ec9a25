package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end negative test for Verify's ANN recall gate: the gate must
  * measure recall of the DUMPED parquet against the in-engine exact
  * top-k, DELETE a below-floor dump (so the driver's rows-check sees a
  * missing dump = hard FAIL), keep passing dumps, record every measured
  * value in ann_recall.json, and tie q68's floor to q65's MEASURED
  * recall rather than a static constant. Dumps here are constructed
  * from the (oracle-checked) brute-force exact result, degraded
  * deliberately — no ANN index build needed, so the spec stays fast.
  */
class VerifyGateSpec extends SparkSpec {

  private def dump(df: DataFrame, outDir: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")

  /** Exact result with every neighbor id shifted into ids that are
    * never true neighbors — recall 0 by construction. */
  private def degraded(exact: DataFrame): DataFrame =
    exact.withColumn("neighbor_id", col("neighbor_id") + lit(1000000L))

  test("ann gate: degraded dump is deleted, healthy dump survives, " +
    "q68 floor tracks q65's measured recall") {
    val outDir = Files.createTempDirectory("graft_anngate").toString
    val exact = graft.operators.Similarity.q35KnnBrute(spark, sfDir)

    // q36 healthy (recall 1.0 ≥ 0.9); q41 degraded (recall 0 < 0.7);
    // q65 healthy (recall 1.0) so q68's floor becomes 1.0; q68 at
    // recall 0.5 — above the static-floor style 0.55-would-be bar is
    // irrelevant: it must fail against q65's measured 1.0.
    dump(exact, outDir, "q36_knn_lsh")
    dump(degraded(exact), outDir, "q41_knn_ivf")
    dump(exact, outDir, "q65_knn_ivfpq")
    val half = exact.withColumn("neighbor_id",
      when(col("rank") <= graft.operators.Similarity.k / 2,
        col("neighbor_id")).otherwise(col("neighbor_id") + lit(1000000L)))
    dump(half, outDir, "q68_knn_ivfpq_res")

    // a dump dir a crashed query left EMPTY (no readable parquet) must
    // be skipped by the gate, not crash the whole verify run — the
    // broken dump already fails the driver's compare on its own
    new java.io.File(s"$outDir/q61_knn_pq").mkdirs()

    val gates = Verify.enforceAnnGate(spark, sfDir, outDir,
      Seq("q36_knn_lsh", "q41_knn_ivf", "q61_knn_pq", "q65_knn_ivfpq",
        "q68_knn_ivfpq_res"))
    assert(!gates.contains("q61_knn_pq"))

    assert(gates("q36_knn_lsh").pass && gates("q36_knn_lsh").recall === 1.0)
    assert(!gates("q41_knn_ivf").pass && gates("q41_knn_ivf").recall === 0.0)
    assert(gates("q65_knn_ivfpq").pass)
    val g68 = gates("q68_knn_ivfpq_res")
    assert(g68.floor === 1.0,
      "q68 floor must be q65's measured recall, not a static constant")
    assert(!g68.pass && g68.recall > 0.3 && g68.recall < 0.7)

    // failing dumps deleted → driver records missing-dump FAIL;
    // passing dumps intact
    assert(!new java.io.File(s"$outDir/q41_knn_ivf").exists())
    assert(!new java.io.File(s"$outDir/q68_knn_ivfpq_res").exists())
    assert(new java.io.File(s"$outDir/q36_knn_lsh").exists())
    assert(new java.io.File(s"$outDir/q65_knn_ivfpq").exists())

    // every measurement recorded, including the failing ones
    val recorded = Files.readString(
      java.nio.file.Paths.get(s"$outDir/ann_recall.json"))
    Seq("q36_knn_lsh", "q41_knn_ivf", "q65_knn_ivfpq", "q68_knn_ivfpq_res")
      .foreach(n => assert(recorded.contains(n)))
    assert(recorded.contains("\"pass\": false"))
  }

  test("ann gate: q68 alone measures q65 live for its floor, ignoring " +
    "a stale q65 dump from a prior run") {
    val outDir = Files.createTempDirectory("graft_anngate_solo").toString
    val exact = graft.operators.Similarity.q35KnnBrute(spark, sfDir)
    dump(exact, outDir, "q68_knn_ivfpq_res")
    // a LEFTOVER q65 dump (recall 1.0 by construction) that this
    // targeted run did NOT produce: reading it would set the floor to
    // 1.0 — the floor must instead come from running q65 live, whose
    // real recall at sf0.001 is well under 1.0
    dump(exact, outDir, "q65_knn_ivfpq")
    val gates = Verify.enforceAnnGate(spark, sfDir, outDir,
      Seq("q68_knn_ivfpq_res"))
    val g = gates("q68_knn_ivfpq_res")
    assert(g.recall === 1.0 && g.pass)
    assert(g.floor > 0.0 && g.floor < 1.0,
      "floor must be q65's LIVE recall, not the stale dump's 1.0")
  }

  test("ann gate: machinery failure deletes gated dumps and leaves no " +
    "stale recall artifact") {
    val outDir = Files.createTempDirectory("graft_anngate_crash").toString
    val exact = graft.operators.Similarity.q35KnnBrute(spark, sfDir)
    dump(exact, outDir, "q36_knn_lsh")
    // a "prior run's" artifact that must not survive a failed gate
    Files.writeString(
      java.nio.file.Paths.get(s"$outDir/ann_recall.json"),
      """{"stale": true}""")
    // an sfDir with no embeddings table: the exact top-k (the gate's
    // own machinery) throws before any measurement exists
    val bogusSf = Files.createTempDirectory("graft_no_tables").toString
    val gates = Verify.enforceAnnGate(spark, bogusSf, outDir,
      Seq("q36_knn_lsh"))
    assert(gates.isEmpty)
    // unverifiable recall is not a pass: the gated dump is gone and the
    // stale artifact did not outlive the failure
    assert(!new java.io.File(s"$outDir/q36_knn_lsh").exists())
    assert(!new java.io.File(s"$outDir/ann_recall.json").exists())
  }

  test("ann gate: non-ANN selections measure nothing") {
    val outDir = Files.createTempDirectory("graft_anngate_none").toString
    assert(Verify.enforceAnnGate(spark, sfDir, outDir,
      Seq("q1_agg", "q35_knn_brute")).isEmpty)
    assert(!new java.io.File(s"$outDir/ann_recall.json").exists())
  }

  test("dedup gate: a low-recall q71 dump is deleted, a false-dropping " +
    "one records recall -1, a faithful one survives") {
    import spark.implicits._
    val exact = graft.operators.Similarity.q45EmbedDedup(spark, sfDir)
    val all = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "label")
    val exactDroppedIds = all.select("vec_id").as[Long].collect().toSet --
      exact.select("vec_id").as[Long].collect().toSet
    assert(exactDroppedIds.nonEmpty, "fixture must drop something")

    // 1. faithful dump (identical survivor set): recall 1.0, survives
    val out1 = Files.createTempDirectory("graft_ddgate1").toString
    dump(exact, out1, Verify.dedupIdx)
    val g1 = Verify.enforceAnnGate(spark, sfDir, out1, Seq(Verify.dedupIdx))
    assert(g1(Verify.dedupIdx).pass && g1(Verify.dedupIdx).recall === 1.0)
    assert(new java.io.File(s"$out1/${Verify.dedupIdx}").exists())
    assert(Files.readString(java.nio.file.Paths
      .get(s"$out1/ann_recall.json")).contains(Verify.dedupIdx))

    // 2. low recall: survivors keep HALF the exact drops → recall 0.5
    //    < floor → dump deleted (driver sees missing dump = hard FAIL)
    val resurrect = exactDroppedIds.toSeq.sorted
      .take(exactDroppedIds.size / 2).toSet
    val out2 = Files.createTempDirectory("graft_ddgate2").toString
    dump(all.filter(col("vec_id").isInCollection(resurrect))
      .unionByName(exact), out2, Verify.dedupIdx)
    val g2 = Verify.enforceAnnGate(spark, sfDir, out2, Seq(Verify.dedupIdx))
    assert(!g2(Verify.dedupIdx).pass)
    assert(g2(Verify.dedupIdx).recall < 0.6 &&
      g2(Verify.dedupIdx).recall > 0.3)
    assert(!new java.io.File(s"$out2/${Verify.dedupIdx}").exists())

    // 3. false drop: survivors miss a vector the exact answer KEEPS —
    //    impossible for a healthy build (exact-verified candidates), so
    //    the gate records the loud -1 and deletes
    val keptId = exact.select("vec_id").as[Long].head()
    val out3 = Files.createTempDirectory("graft_ddgate3").toString
    dump(exact.filter(col("vec_id") =!= keptId), out3, Verify.dedupIdx)
    val g3 = Verify.enforceAnnGate(spark, sfDir, out3, Seq(Verify.dedupIdx))
    assert(!g3(Verify.dedupIdx).pass && g3(Verify.dedupIdx).recall === -1.0)
    assert(!new java.io.File(s"$out3/${Verify.dedupIdx}").exists())
  }

  test("hybrid gate: a degraded q75 dump is deleted, a faithful one " +
    "survives, and a fresh q73 dump in the same run is the baseline") {
    import java.nio.file.Files
    val exact = graft.operators.Retrieval.q73HybridRrf(spark, sfDir)

    // 1. faithful dump (the exact answer itself): overlap 1.0, survives
    val out1 = Files.createTempDirectory("graft_hygate1").toString
    dump(exact, out1, Verify.hybridIdx)
    val g1 = Verify.enforceAnnGate(spark, sfDir, out1, Seq(Verify.hybridIdx))
    assert(g1(Verify.hybridIdx).pass && g1(Verify.hybridIdx).recall === 1.0)
    assert(new java.io.File(s"$out1/${Verify.hybridIdx}").exists())

    // 2. degraded dump (every id shifted off the real result set):
    //    overlap 0 → deleted → the driver records a hard FAIL
    val out2 = Files.createTempDirectory("graft_hygate2").toString
    dump(exact.withColumn("id", col("id") + lit(1000000L)),
      out2, Verify.hybridIdx)
    val g2 = Verify.enforceAnnGate(spark, sfDir, out2, Seq(Verify.hybridIdx))
    assert(!g2(Verify.hybridIdx).pass && g2(Verify.hybridIdx).recall === 0.0)
    assert(!new java.io.File(s"$out2/${Verify.hybridIdx}").exists())

    // 3. when q73 was dumped by the SAME run, the gate reads it as the
    //    baseline instead of re-running the exact query — a doctored
    //    q73 dump shifts the measured overlap, proving the dump (not a
    //    live run) was consulted
    val out3 = Files.createTempDirectory("graft_hygate3").toString
    dump(exact, out3, Verify.hybridIdx)
    dump(exact.withColumn("id", col("id") + lit(1000000L)),
      out3, Verify.hybridExact)
    val g3 = Verify.enforceAnnGate(spark, sfDir, out3,
      Seq(Verify.hybridIdx, Verify.hybridExact))
    assert(!g3(Verify.hybridIdx).pass && g3(Verify.hybridIdx).recall === 0.0)
  }

  test("screen gate: a low-recall q76 dump is deleted, a " +
    "false-rejecting one records recall -1, a faithful one survives") {
    import spark.implicits._
    val batchRows = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(graft.operators.IngestScreen.batchPred)
      .select("vec_id", "label")
    val exactRejected = graft.operators.IngestScreen
      .exactRejects(spark, sfDir).select("vec_id").as[Long].collect().toSet
    assert(exactRejected.nonEmpty, "fixture batch must reject something")
    val faithful = batchRows
      .filter(!col("vec_id").isInCollection(exactRejected))

    // 1. faithful dump (the exact screen's survivors): recall 1.0,
    //    survives, measurement recorded
    val out1 = Files.createTempDirectory("graft_scgate1").toString
    dump(faithful, out1, Verify.screenIdx)
    val g1 = Verify.enforceAnnGate(spark, sfDir, out1, Seq(Verify.screenIdx))
    assert(g1(Verify.screenIdx).pass && g1(Verify.screenIdx).recall === 1.0)
    assert(new java.io.File(s"$out1/${Verify.screenIdx}").exists())
    assert(Files.readString(java.nio.file.Paths
      .get(s"$out1/ann_recall.json")).contains(Verify.screenIdx))

    // 2. low recall: the dump ADMITS most of the exact rejects (keeps
    //    one rejection) → recall < floor → deleted (hard driver FAIL)
    val keepOne = exactRejected.toSeq.sorted.take(1).toSet
    val out2 = Files.createTempDirectory("graft_scgate2").toString
    dump(batchRows.filter(!col("vec_id").isInCollection(keepOne)),
      out2, Verify.screenIdx)
    val g2 = Verify.enforceAnnGate(spark, sfDir, out2, Seq(Verify.screenIdx))
    assert(!g2(Verify.screenIdx).pass &&
      g2(Verify.screenIdx).recall < Verify.screenFloor)
    assert(!new java.io.File(s"$out2/${Verify.screenIdx}").exists())

    // 3. false reject: the dump drops a batch row the exact screen
    //    keeps — impossible for a healthy build (rejections are
    //    exact-verified), recorded as the loud -1 and deleted
    val keptId = faithful.select("vec_id").as[Long].head()
    val out3 = Files.createTempDirectory("graft_scgate3").toString
    dump(faithful.filter(col("vec_id") =!= keptId), out3, Verify.screenIdx)
    val g3 = Verify.enforceAnnGate(spark, sfDir, out3, Seq(Verify.screenIdx))
    assert(!g3(Verify.screenIdx).pass &&
      g3(Verify.screenIdx).recall === -1.0)
    assert(!new java.io.File(s"$out3/${Verify.screenIdx}").exists())
  }

  test("correction gate: a region-only degradation fails the region " +
    "floor and deletes the REAL q82 dump — the _region entry enforces " +
    "on q82_correction_ann, not on a nonexistent directory") {
    val outDir = Files.createTempDirectory("graft_anngate_corr").toString
    val corpusDir =
      graft.operators.DeletePipeline.ensureCorrected(spark, sfDir)
    val exact = graft.operators.Similarity.q35KnnBrute(spark, corpusDir)
    val corrIds = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(graft.operators.DeletePipeline.kill(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(corrIds.nonEmpty)
    // corrupt ONLY the corrected-region pairs: overall recall stays
    // comfortably over its floor, the region serves nothing — the
    // exact regression class the region floor exists for
    val corrupted = exact.withColumn("neighbor_id",
      when(col("query_id").isin(corrIds.toSeq: _*) ||
          col("neighbor_id").isin(corrIds.toSeq: _*),
        col("neighbor_id") + lit(1000000L)).otherwise(col("neighbor_id")))
    dump(corrupted, outDir, "q82_correction_ann")
    val gates = Verify.enforceAnnGate(spark, sfDir, outDir,
      Seq("q82_correction_ann"))
    assert(gates("q82_correction_ann").pass,
      "the overall recall leg should still pass — the region is small")
    val region = gates("q82_correction_ann_region")
    assert(!region.pass && region.recall === 0.0)
    assert(!new java.io.File(s"$outDir/q82_correction_ann").exists(),
      "a region-floor failure must delete the q82 dump itself")
    // and the artifact carries both entries
    val rj = Files.readString(
      java.nio.file.Paths.get(s"$outDir/ann_recall.json"))
    assert(rj.contains("q82_correction_ann_region"))
  }

  test("twin identity: a persisted-index dump diverging from its " +
    "in-query twin is deleted; an identical one survives") {
    val outDir = Files.createTempDirectory("graft_twin").toString
    val exact = graft.operators.Similarity.q35KnnBrute(spark, sfDir)
    val all = Seq("q65_knn_ivfpq", "q69_knn_ivfpq_idx",
      "q68_knn_ivfpq_res", "q70_knn_ivfpq_res_idx")
    // q69 identical to q65 → survives. q70 differs from q68 in ONE
    // neighbor id — the stale-persisted-artifact shape (same-dial
    // algorithm change without a formatVersion bump) that recall
    // floors alone can pass — → deleted, hard driver FAIL.
    dump(exact, outDir, "q65_knn_ivfpq")
    dump(exact, outDir, "q69_knn_ivfpq_idx")
    dump(exact, outDir, "q68_knn_ivfpq_res")
    val oneOff = exact.withColumn("neighbor_id",
      when(col("rank") === 1 && col("query_id") === 0L,
        col("neighbor_id") + lit(1L)).otherwise(col("neighbor_id")))
    dump(oneOff, outDir, "q70_knn_ivfpq_res_idx")
    Verify.enforceTwinIdentity(spark, outDir, all)
    assert(new java.io.File(s"$outDir/q69_knn_ivfpq_idx").exists())
    assert(!new java.io.File(s"$outDir/q70_knn_ivfpq_res_idx").exists(),
      "diverged twin dump must be deleted")
    // the in-query twins are never touched by the twin check
    assert(new java.io.File(s"$outDir/q65_knn_ivfpq").exists())
    assert(new java.io.File(s"$outDir/q68_knn_ivfpq_res").exists())

    // targeted run without the twin: nothing to compare against — the
    // check must not delete (the recall floor still gates it)
    val out2 = Files.createTempDirectory("graft_twin2").toString
    dump(oneOff, out2, "q70_knn_ivfpq_res_idx")
    Verify.enforceTwinIdentity(spark, out2, Seq("q70_knn_ivfpq_res_idx"))
    assert(new java.io.File(s"$out2/q70_knn_ivfpq_res_idx").exists())
  }

  test("twin identity append exemption: a PLAUSIBLE append state stands " +
    "the gate down; an implausible self-report (appended > n) does not") {
    import spark.implicits._
    val exact = graft.operators.Similarity.q35KnnBrute(spark, sfDir)
    val oneOff = exact.withColumn("neighbor_id",
      when(col("rank") === 1 && col("query_id") === 0L,
        col("neighbor_id") + lit(1L)).otherwise(col("neighbor_id")))
    val names = Seq("q68_knn_ivfpq_res", "q70_knn_ivfpq_res_idx")
    val idxDir = Files.createTempDirectory("graft_twin_meta")
      .toString + "/idx"
    def writeMeta(appended: Long, n: Long): Unit =
      Seq((2, n, 0L, 16, 1.0, appended, 8, 16, 20, 20, 0.0))
        .toDF("version", "n", "fp", "nl", "res_norm", "appended_n",
          "subspaces", "pq_codes", "lloyd_iters", "pq_lloyd_iters",
          "app_res_sum")
        .coalesce(1).write.mode("overwrite").parquet(s"$idxDir/meta")
    // plausible: 50 of 500 rows appended — bit-identity legitimately
    // does not apply (the index serves pre-append artifacts), so even
    // a DIVERGED q70 dump must survive; recall floors still gate it
    val out1 = Files.createTempDirectory("graft_twin_ex1").toString
    dump(exact, out1, "q68_knn_ivfpq_res")
    dump(oneOff, out1, "q70_knn_ivfpq_res_idx")
    writeMeta(appended = 50, n = 500)
    Verify.enforceTwinIdentity(spark, out1, names, Some(idxDir))
    assert(new java.io.File(s"$out1/q70_knn_ivfpq_res_idx").exists())
    // implausible: meta claims MORE appends than indexed rows — a
    // corrupted/doctored meta must not disable the gate by asserting
    // appends, so the identity check runs and the diverged dump dies
    val out2 = Files.createTempDirectory("graft_twin_ex2").toString
    dump(exact, out2, "q68_knn_ivfpq_res")
    dump(oneOff, out2, "q70_knn_ivfpq_res_idx")
    writeMeta(appended = 600, n = 500)
    Verify.enforceTwinIdentity(spark, out2, names, Some(idxDir))
    assert(!new java.io.File(s"$out2/q70_knn_ivfpq_res_idx").exists(),
      "implausible append self-report must not stand down the gate")
  }
}
