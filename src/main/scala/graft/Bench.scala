package graft

/** Benchmark main: every SparkEntry query, per-query MEDIAN of n runs.
  *
  * Medians because single-shot numbers in a shared sandbox swing ±2.5×
  * under co-tenant load (round-2 lesson: one query recorded 20.4 s,
  * re-ran at 8.1 s) — decisions can't be driven off one sample. A query
  * that throws is recorded as -1 with its message in an "errors" field,
  * never as a normal-looking elapsed time. Contamination-flagged
  * spreads (med/min > 2, the host-steal signature) are re-run with a
  * bounded retry budget and the adjudication is stamped into the
  * artifact — the record refuses to carry an inflated median its own
  * min refutes without saying so.
  */
object Bench {
  private val runsPerQuery = 3

  /** Untimed JIT/codegen + parquet-footer warmup. Shared with
    * [[IsoBench]] BY DEFINITION, not by copy: IsoBench exists to
    * adjudicate query-vs-context for full-bench readings, which is
    * only valid while its run-1 conditions match a bench run's —
    * one shared body keeps that true under any future warmup tweak. */
  private[graft] def warmup(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => () }
    }
  }

  /** Pre-delete for a COLD build measurement, refusing to proceed on
    * a failed delete (Verify.deleteOrDie's unchecked-false
    * discipline): a survivor dir would make ensure() VALIDATE the
    * stale artifacts — build_sec recorded as ~0 and the timed runs
    * served by a prior build's index, a silent stale-artifact
    * measurement in a committed record. */
  private def deleteColdOrDie(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val (fs, p) = Scratch.fs(spark, dir)
    if (fs.exists(p)) {
      fs.delete(p, true)
      if (fs.exists(p))
        throw new IllegalStateException(s"failed to delete $dir for a " +
          "cold build — a stale survivor would impersonate the build " +
          "measurement")
    }
  }

  /** One timed materialization through the noop sink: every row runs
    * the FULL plan — count() would let Catalyst eliminate final
    * sorts/projections. Seconds. Shared with [[IsoBench]].
    *
    * BY-NAME parameter, deliberately: queries that call
    * [[graft.Materialize]] run an EAGER localCheckpoint during plan
    * construction — often the query's dominant cost (tokenize+shingle
    * for the dedup family). A by-value signature evaluated the
    * argument before t0, silently excluding that work from every
    * recorded number (caught round 11 when an eager checkpoint made a
    * 28 s probe query "measure" 0.7 s); ScaleProbe always timed build +
    * execution together, which is the honest basis this restores.
    * Records from rounds ≤ 11 under-time the Materialize-using queries
    * by their build phase — compare against them per-query with that
    * caveat. */
  private[graft] def timeNoop(df: => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** (median, min, max) of a sample pool; all -1 for an empty pool
    * (every run threw — the error field carries the reason). */
  private[graft] def statsOf(ts: Seq[Double]): (Double, Double, Double) = {
    val sorted = ts.sorted
    if (sorted.isEmpty) (-1.0, -1.0, -1.0)
    else (sorted(sorted.size / 2), sorted.head, sorted.last)
  }

  /** med/min of the pool — the contamination signal (0 when unknowable). */
  private[graft] def ratioOf(ts: Seq[Double]): Double = {
    val (med, mn, _) = statsOf(ts)
    if (mn > 0) med / mn else 0.0
  }

  /** Self-adjudication of contamination-flagged spreads. A med/min > 2
    * spread is the one-sided signature of host CPU stealing (invisible
    * to guest loadavg; two prior round artifacts carried 4-10×
    * inflated medians their own clean re-runs refuted). Rather than
    * emit a record the repo's other measurements contradict, RE-RUN
    * each flagged query — up to `maxExtraRuns` extra samples, merged
    * into its pool — until the median stabilizes (ratio ≤ 2) or the
    * budget is spent. Returns the merged pools plus, for every query
    * that was EVER flagged, (extra runs taken, final ratio) — a final
    * ratio still > 2 is an explicitly unresolved contamination the
    * artifact must carry, never a silent one. `rerun` returning None
    * (the query threw) still consumes budget — a query that fails
    * under re-run must not retry forever. */
  private[graft] def adjudicate(
      initial: Map[String, Vector[Double]], maxExtraRuns: Int,
      rerun: String => Option[Double], globalBudget: Int = 60)
      : (Map[String, Vector[Double]], Map[String, (Int, Double)]) = {
    var samples = initial
    var adjudications = Map.empty[String, (Int, Double)]
    // global cap across ALL flagged queries: a steal storm that flags
    // dozens must not multiply the bench's wall-clock unboundedly —
    // once the budget is gone, remaining flags are stamped unresolved
    // (ratio still > 2 in the artifact) instead of silently untried
    var totalExtra = 0
    samples.keys.toSeq.sorted.foreach { name =>
      if (ratioOf(samples(name)) > 2.0) {
        var extra = 0
        while (ratioOf(samples(name)) > 2.0 && extra < maxExtraRuns &&
            totalExtra < globalBudget) {
          rerun(name).foreach(t => samples += name -> (samples(name) :+ t))
          extra += 1
          totalExtra += 1
        }
        adjudications += name -> (extra, ratioOf(samples(name)))
        System.err.println(f"[bench] $name re-adjudicated: $extra extra " +
          f"runs, med/min now ${ratioOf(samples(name))}%.2f")
      }
    }
    (samples, adjudications)
  }

  /** Per-query medians out of a committed clean spread file's text —
    * the only JSON this main ever has to READ, so a targeted regex
    * beats pulling in a parser: entries look like
    * `"q12_event_props":{"med":0.44,...}` (the adjudications map's
    * values start with "extra_runs", so they can't false-match). */
  private[graft] def parseRefMeds(text: String): Map[String, Double] =
    """"([A-Za-z0-9_]+)":\{"med":(-?[0-9.eE+]+)""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Cross-RUN adjudication — the steal mode [[adjudicate]] cannot
    * see. Within-run med/min flags need at least one clean sample in
    * the pool; a steal window covering ALL of a query's samples
    * uniformly leaves med/min ≈ 1 while the median is several× wrong
    * (BENCH_r12 recorded q12 at 6.9 s against five independent clean
    * spreads' 0.40-0.47 s exactly this way). The committed clean
    * spread is the reference: each query's med/ref ratio is compared
    * against the run's MEDIAN ratio — the host-speed control, so a
    * uniformly slower host (every query 1.6×) flags nothing — and a
    * query beyond `flagFactor`× that control with a non-trivial
    * absolute median re-runs until it returns to band or the budget is
    * spent. A flag that SURVIVES its re-runs is a reproduced, host-
    * normalized regression — exactly the signal a recorded artifact
    * should carry loudly; stamps land in the spread JSON either way.
    * Queries absent from the reference (new this round) are
    * unjudgeable and left alone; same for runs sharing fewer than
    * `minCommon` queries with it (no stable control). */
  /** One flag threshold for adjudicateXrun AND the noise-line
    * unresolved count — a count judged at a different bar than the
    * flags were raised at would under/overstate reproduced
    * regressions. Tightened 3.0 → 2.0 (VERDICT r15 #1): the r15
    * continuation spread carried a 1.5–2.4× host-normalized drift
    * cluster vs BENCH_CLEAN that the 3× bar passed silently; at 2×
    * those queries re-run under this adjudicator and a surviving
    * flag is stamped into the artifact instead of discovered a round
    * later. The within-run med/min bar is already 2.0 — one bar. */
  private[graft] val xrunFlagFactor = 2.0

  private[graft] def adjudicateXrun(
      initial: Map[String, Vector[Double]],
      refMeds: Map[String, Double], maxExtraRuns: Int,
      rerun: String => Option[Double], globalBudget: Int = 40,
      flagFactor: Double = xrunFlagFactor, minAbsSec: Double = 0.3,
      minCommon: Int = 5)
      : (Map[String, Vector[Double]],
         Map[String, (Double, Int, Double)], Double) = {
    var samples = initial
    def medOf(name: String): Double = statsOf(samples(name))._1
    val common = samples.keys.filter(q =>
      refMeds.get(q).exists(_ > 0) && medOf(q) > 0).toSeq.sorted
    if (common.size < minCommon) return (samples, Map.empty, 0.0)
    val hostFactor = statsOf(common.map(q => medOf(q) / refMeds(q)))._1
    def ratioNow(name: String): Double =
      medOf(name) / refMeds(name) / hostFactor
    var adjudications = Map.empty[String, (Double, Int, Double)]
    var totalExtra = 0
    common.foreach { name =>
      if (ratioNow(name) > flagFactor && medOf(name) >= minAbsSec) {
        val before = ratioNow(name)
        var extra = 0
        while (ratioNow(name) > flagFactor && extra < maxExtraRuns &&
            totalExtra < globalBudget) {
          rerun(name).foreach(t => samples += name -> (samples(name) :+ t))
          extra += 1
          totalExtra += 1
        }
        adjudications += name -> (before, extra, ratioNow(name))
        System.err.println(f"[bench] $name cross-run re-adjudicated: " +
          f"${before}%.2fx vs clean record (host-normalized), $extra " +
          f"extra runs, now ${ratioNow(name)}%.2fx")
      }
    }
    (samples, adjudications, hostFactor)
  }

  /** Driver-tail totals line: same schema as the full line, per-query
    * values as integer CENTISECONDS ("qunit":"cs"). The -1 error
    * sentinel is preserved as -1 (never scaled — a consumer must not
    * read -100 as a real duration). "sf" is the numeric scale factor
    * when the dir name carries one ("sf0.1" → 0.1), else the short
    * basename — the full line keeps the complete path. Keys sorted so
    * the line is deterministic across runs. host_factor is NOT here
    * (full line and noise line both carry it): at 85 names the cs
    * rendering already sits ~1980 chars against the 2000-char window,
    * and those 20 chars are the margin. If queries ever get slow
    * enough (many ≥10 s → 4-digit cs) to overflow `maxLen`, the line
    * degrades stepwise to DECISECONDS then whole SECONDS ("qunit"
    * says which) rather than losing its head — a coarser number that
    * parses beats a precise one that doesn't. With 85 names even the
    * seconds rendering only exceeds the window when most queries run
    * >=100 s (a multi-hour bench); then the coarsest line is emitted
    * anyway as the least-truncated option. */
  private[graft] def compactLine(results: Map[String, Double],
      total: Double, sfDir: String, flags: Int,
      maxLen: Int = 1995): String = {
    val base = sfDir.stripSuffix("/").split('/').last
    val num = base.stripPrefix("sf")
    val sfJson =
      if (num.matches("""[0-9]+(\.[0-9]+)?""")) num else Json.str(base)
    def render(qunit: String, scale: Int): String = {
      val qs = results.toSeq.sortBy(_._1).map { case (k, v) =>
        val n = if (v < 0) -1L else math.round(v * scale)
        s"${Json.str(k)}:$n"
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${Json.f3(total)},"unit":"sec","qunit":"$qunit","queries":$qs,"sf":$sfJson,"flags":$flags}"""
    }
    val renderings =
      Seq(render("cs", 100), render("ds", 10), render("s", 1))
    renderings.find(_.length <= maxLen).getOrElse(renderings.last)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // clear any prior spread up front: if this run dies mid-bench, a
    // stale file must not impersonate it in a later compare_probe
    val spreadPath = sys.env.getOrElse("GRAFT_BENCH_SPREAD", "bench_spread.json")
    def deleteSpreadQuietly(): Unit =
      try java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(spreadPath))
      catch { case _: Throwable => () }
    deleteSpreadQuietly()
    val spark = GraftSession.local("graft-bench")
    // Untimed warmup: JIT/codegen paths and parquet footers, so the
    // first measured query doesn't absorb session startup.
    warmup(spark, sfDir)
    // Persisted-index lifecycle, reported SEPARATELY: delete the
    // stable index dir and rebuild it COLD, once, before the timing
    // loop — the q69/q70 medians below then carry NO TRAINING, only
    // serving plus the per-call freshness-validation corpus scan that
    // the stateless driver contract forces on them (O(corpus) — at
    // this sf noise, at deployment scale the reason a real caller
    // validates once per session, see IndexStore.ensure's doc). The
    // one-time build cost is its own number instead of silently
    // inflating run 1 of 3, and a stale index from a prior
    // bench/verify run never serves here (the delete forces the
    // rebuild).
    // build failure is a SEPARATE field, never a -1.0 duration: a
    // consumer that averages/plots index_build_sec must not ingest a
    // sentinel as a real measurement (q69/q70 surface their own errors
    // in the timing loop below either way)
    var indexBuildErr: Option[String] = None
    val indexBuildSec: Option[Double] =
      if (!SparkEntry.queries.contains("q69_knn_ivfpq_idx")) None
      else try {
        deleteColdOrDie(spark, operators.IndexStore.dirFor(spark, sfDir))
        Some(operators.IndexStore.ensure(spark, sfDir).buildSec)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] index build failed: ${e.getMessage}")
        indexBuildErr =
          Some(Json.err(e))
        None
      }
    // lexical index: same cold-rebuild-before-timing contract as the
    // ANN index — q74's medians carry serving only, the one-time
    // tokenize+persist cost is its own field
    var lexBuildErr: Option[String] = None
    val lexBuildSec: Option[Double] =
      if (!SparkEntry.queries.contains("q74_bm25_topk_idx")) None
      else try {
        deleteColdOrDie(spark, operators.LexIndex.dirFor(spark, sfDir))
        Some(operators.LexIndex.ensure(spark, sfDir).buildSec)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] lex index build failed: ${e.getMessage}")
        lexBuildErr = Some(Json.err(e))
        None
      }
    // veclists sidecar (q76's screen layout): same cold-rebuild
    // contract — q76's medians carry screening only, the one-time
    // cell-partitioned vector rewrite is its own field
    var vlBuildErr: Option[String] = None
    val vlBuildSec: Option[Double] =
      if (!SparkEntry.queries.contains("q76_ingest_screen")) None
      else try {
        deleteColdOrDie(spark, operators.IngestScreen.listsDir(spark, sfDir))
        Some(operators.IngestScreen.ensureLists(spark, sfDir,
          operators.IndexStore.ensure(spark, sfDir)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] veclists build failed: ${e.getMessage}")
        vlBuildErr = Some(Json.err(e))
        None
      }
    // physical-layout rewrites (q57/q58/q62): same cold-rebuild
    // contract as the index families above. These were the ONE
    // ensure-once artifact family the bench did not prebuild — a
    // driver-environment /tmp wipe then forced the bucketed-table
    // write into a timed q57 run (BENCH_r18: 1.80 s at both core
    // counts vs a 0.83 s clean median). The medians below now carry
    // pure read-side serving; the write-side investment is its own
    // layout_build_sec field.
    var layoutBuildErr: Option[String] = None
    val layoutBuildSec: Option[Double] =
      if (!Seq("q57_bucket_join", "q58_partition_prune", "q62_zorder_skip")
          .exists(SparkEntry.queries.contains)) None
      else try {
        deleteColdOrDie(spark, operators.Layout.dirFor(spark, sfDir))
        val t0 = System.nanoTime()
        operators.Layout.ensureAll(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] layout build failed: ${e.getMessage}")
        layoutBuildErr = Some(Json.err(e))
        None
      }
    // composed-lifecycle scratch pipelines (q79–q82): force the seed +
    // index-build + erase/correct phase ONCE before the timing loop,
    // reported as its own field — on a cold container the first timed
    // q81 run otherwise carries the whole ~8 s scratch build and the
    // single-run driver artifact records it as query cost (BENCH_r15
    // q81 8.47 s vs 1.04 s spread median; VERDICT r15 #6). The scratch
    // roots are deleted first so the number is the reproducible COLD
    // build, same contract as index_build_sec.
    var delpipeBuildErr: Option[String] = None
    val delpipeBuildSec: Option[Double] =
      // keyed on EITHER consumer of the shared scratch: dropping q79
      // while keeping q80 must not hand q80's first timed run the
      // whole cold seed+erase build (the BENCH_r15 distortion class)
      if (!Seq("q79_delete_lex", "q80_delete_ann")
          .exists(SparkEntry.queries.contains)) None
      else try {
        deleteColdOrDie(spark,
          operators.DeletePipeline.pipeDirFor(spark, sfDir))
        val t0 = System.nanoTime()
        operators.DeletePipeline.ensureDeleted(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] delpipe build failed: ${e.getMessage}")
        delpipeBuildErr = Some(Json.err(e))
        None
      }
    var corrpipeBuildErr: Option[String] = None
    val corrpipeBuildSec: Option[Double] =
      if (!Seq("q81_correction_lex", "q82_correction_ann")
          .exists(SparkEntry.queries.contains)) None
      else try {
        deleteColdOrDie(spark,
          operators.DeletePipeline.corrPipeDirFor(spark, sfDir))
        val t0 = System.nanoTime()
        operators.DeletePipeline.ensureCorrected(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] corrpipe build failed: ${e.getMessage}")
        corrpipeBuildErr = Some(Json.err(e))
        None
      }
    var errors = Map.empty[String, String]
    val initial: Map[String, Vector[Double]] =
      SparkEntry.queries.map { case (name, fn) =>
        name -> (1 to runsPerQuery).flatMap { _ =>
          try Some(timeNoop(fn(spark, sfDir)))
          catch {
            case e: Throwable =>
              errors += name -> Json.err(e)
              None
          }
        }.toVector
      }
    val rerunFn: String => Option[Double] = name =>
      try Some(timeNoop(SparkEntry.queries(name)(spark, sfDir)))
      catch { case e: Throwable => errors += name -> Json.err(e); None }
    val (samples0, adjudications) =
      adjudicate(initial, 2 * runsPerQuery, rerunFn)
    // cross-run pass against the committed clean record (see
    // adjudicateXrun's doc): catches the uniform-steal windows the
    // within-run med/min signal is blind to
    val refPath = sys.env.getOrElse("GRAFT_BENCH_REF", "BENCH_CLEAN.json")
    val refMeds =
      try parseRefMeds(java.nio.file.Files.readString(
        java.nio.file.Paths.get(refPath)))
      catch { case _: Throwable => Map.empty[String, Double] }
    val (samples, xrunFlags, hostFactor) =
      adjudicateXrun(samples0, refMeds, 2 * runsPerQuery, rerunFn)
    val spreads = samples.map { case (name, ts) => name -> statsOf(ts) }
    val results = spreads.map { case (k, (med, _, _)) => k -> med }
    // 3-decimal seconds keep the whole line compact: the driver records
    // only an output TAIL, and a long line risks losing its own head
    def f3(v: Double): String = Json.f3(v) // one shared rendering
    // Full per-query {med,min,max} spreads go to a FILE, not the stdout
    // line: the driver's artifact keeps only a 2000-char output tail
    // and the compact median line already fills ~1800 of it. The spread
    // is what makes a stolen-CPU run SELF-IDENTIFYING — on this host,
    // co-tenant CPU stealing (invisible to guest loadavg) inflates
    // individual samples 3-60×, so med/min ≫ 1 marks a contaminated
    // measurement and round-over-round comparisons should use min
    // (scripts/compare_probe.py does both when given spread files).
    val spreadQs = spreads.map { case (k, (med, mn, mx)) =>
      s"${Json.str(k)}:{\"med\":${f3(med)},\"min\":${f3(mn)},\"max\":${f3(mx)}}"
    }.mkString("{", ",", "}")
    // seconds-only variant for the NOISE line: the error strings (up
    // to ~200 chars each, five possible at once) belong in the spread
    // FILE — on the stdout line they could push noise+median past the
    // driver's 2000-char tail and truncate the very fields the noise
    // line exists to preserve
    val idxSecsField = Seq(
      indexBuildSec.map(s => s""","index_build_sec":${f3(s)}"""),
      lexBuildSec.map(s => s""","lex_index_build_sec":${f3(s)}"""),
      vlBuildSec.map(s => s""","veclists_build_sec":${f3(s)}"""),
      layoutBuildSec.map(s => s""","layout_build_sec":${f3(s)}"""),
      delpipeBuildSec.map(s => s""","delpipe_build_sec":${f3(s)}"""),
      corrpipeBuildSec.map(s => s""","corrpipe_build_sec":${f3(s)}"""))
      .flatten.mkString
    val idxField = indexBuildSec
      .map(s => s""","index_build_sec":${f3(s)}""").getOrElse("") +
      lexBuildSec
        .map(s => s""","lex_index_build_sec":${f3(s)}""").getOrElse("") +
      lexBuildErr
        .map(m => s""","lex_index_build_error":${Json.str(m)}""")
        .getOrElse("") +
      vlBuildSec
        .map(s => s""","veclists_build_sec":${f3(s)}""").getOrElse("") +
      vlBuildErr
        .map(m => s""","veclists_build_error":${Json.str(m)}""")
        .getOrElse("") +
      layoutBuildSec
        .map(s => s""","layout_build_sec":${f3(s)}""").getOrElse("") +
      layoutBuildErr
        .map(m => s""","layout_build_error":${Json.str(m)}""")
        .getOrElse("") +
      delpipeBuildSec
        .map(s => s""","delpipe_build_sec":${f3(s)}""").getOrElse("") +
      delpipeBuildErr
        .map(m => s""","delpipe_build_error":${Json.str(m)}""")
        .getOrElse("") +
      corrpipeBuildSec
        .map(s => s""","corrpipe_build_sec":${f3(s)}""").getOrElse("") +
      corrpipeBuildErr
        .map(m => s""","corrpipe_build_error":${Json.str(m)}""")
        .getOrElse("") +
      indexBuildErr
        .map(m => s""","index_build_error":${Json.str(m)}""").getOrElse("")
    // timing_basis marks the round-11 basis change (see timeNoop's doc):
    // "plan+exec" totals are NOT comparable to earlier records'
    // exec-only numbers for Materialize-using queries — the artifact
    // must say so itself, or a cross-round diff reads as a regression
    val basisField = s""","timing_basis":"plan+exec""""
    // every initially-flagged query appears here with its retry count
    // and FINAL med/min ratio — a ratio still > 2 is an explicitly
    // unresolved contamination, never a silent one
    val adjField =
      if (adjudications.isEmpty) ""
      else "," + "\"adjudications\":" + adjudications.toSeq.sortBy(_._1)
        .map { case (k, (extra, r)) =>
          s"${Json.str(k)}:{\"extra_runs\":$extra,\"ratio\":${f3(r)}}"
        }.mkString("{", ",", "}")
    // cross-run stamp: host_factor documents the control even when
    // nothing flagged (a reader can re-normalize any query manually);
    // a flag whose "after" is still > xrunFlagFactor survived its
    // re-runs — a reproduced regression vs the clean record, not steal
    val xrunField =
      if (hostFactor <= 0) ""
      else s""","xrun":{"ref":${Json.str(refPath)},""" +
        s""""host_factor":${f3(hostFactor)},"flags":""" +
        xrunFlags.toSeq.sortBy(_._1).map { case (k, (b, extra, a)) =>
          s"${Json.str(k)}:{\"before\":${f3(b)}," +
            s"\"extra_runs\":$extra,\"after\":${f3(a)}}"
        }.mkString("{", ",", "}") + "}"
    val spreadJson =
      s"""{"queries":$spreadQs,"n":$runsPerQuery$idxField$basisField$adjField$xrunField,"sf":${Json.str(sfDir)}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(spreadPath), spreadJson)
    catch { case e: Throwable =>
      System.err.println(s"[bench] spread write failed: ${e.getMessage}")
      // a partial write must not survive either — same stale-artifact
      // rule as the up-front delete
      deleteSpreadQuietly()
    }
    // One SHORT noise line ahead of the main line (both must fit the
    // 2000-char tail): queries whose med/min is STILL > 2 after the
    // bounded re-runs are unresolved contamination — their medians are
    // not comparable across rounds; "readjudicated" counts the flags
    // the retries cleared (full detail in the spread file).
    val contaminated = spreads.collect {
      case (k, (med, mn, _)) if mn > 0 && med / mn > 2.0 => (k, med / mn)
    }.toSeq.sortBy(-_._2)
    val worst = contaminated.headOption
      .map { case (k, r) => s""","worst":${Json.str(s"$k:${f3(r)}x")}""" }
      .getOrElse("")
    val readj = s""","readjudicated":${adjudications.size}"""
    // ONE evaluation of the unresolved-flag predicate, shared by the
    // xrun note and the flags total — written twice they could drift
    val xrunUnresolved =
      if (hostFactor <= 0) 0
      else xrunFlags.count(_._2._3 > xrunFlagFactor)
    val xrunNote =
      if (hostFactor <= 0) ""
      else {
        // host_factor on the STDOUT tail (VERDICT r16 #3): the
        // driver's single-run artifact cannot re-run, but it CAN carry
        // its own context — this run's median med/ref ratio vs the
        // committed clean record. A contaminated driver window then
        // self-identifies to any reader (r16's raw tail read 1.35×
        // uniform vs a 0-flag spread of the same HEAD, and only the
        // spread file said so).
        s""","host_factor":${f3(hostFactor)},""" +
          s""""xrun_flags":${xrunFlags.size},""" +
          s""""xrun_unresolved":$xrunUnresolved"""
      }
    // "flags" = within-run contaminated + unresolved cross-run flags —
    // the one number a reader checks before trusting the median line
    val flagsTotal = contaminated.size + xrunUnresolved
    println(s"""{"noise":{"contaminated":${contaminated.size},"flags":$flagsTotal$worst$readj$xrunNote$idxSecsField$basisField,"spread":${Json.str(spreadPath)}}}""")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => Json.str(k) + ":" + Json.str(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Self-identification fields live at the END of the totals line
    // (VERDICT r17 #1): the driver keeps only the LAST 2000 chars of
    // stdout, and the 83-query map alone overflows that window — a
    // leading noise line (r17's placement) verifiably fell off the
    // captured tail. The tail truncates the FRONT of the window, so
    // trailing fields always survive; host_factor/flags here make a
    // contended driver window self-identify in the artifact itself.
    val tailStamp =
      if (hostFactor <= 0) s""","flags":$flagsTotal"""
      else s""","host_factor":${f3(hostFactor)},"flags":$flagsTotal"""
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":$runsPerQuery,"queries":$qs,"errors":$errJson,"sf":${Json.str(sfDir)}$tailStamp}""")
    // LAST line: the driver-tail compact duplicate of the line above.
    // The driver keeps only the final 2000 chars of stdout and
    // json-parses whole lines; the full-fidelity line has been
    // unparseable from that window since the suite passed ~70 queries
    // (85 query names alone cost ~1,690 chars with JSON punctuation,
    // so even integer-millisecond values overflow). Integer
    // CENTISECOND values are the only faithful all-names encoding
    // that fits (~1,950 chars); "qunit":"cs" marks the encoding and
    // the full-precision seconds stay on the line above and in the
    // spread file. Printed last so a line-based tail parser finds it.
    println(compactLine(results, total, sfDir, flagsTotal))
    spark.stop()
  }
}
