package graft.operators

import graft.SparkSpec

/** Plan-shape regression checks — the properties that keep these
  * operators viable at 100 TB, asserted against the physical plan so a
  * refactor can't silently reintroduce a cross join or lose pushdown. */
class PlanCheckSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  private def scanInfo(df: org.apache.spark.sql.DataFrame): String =
    // physical plan only — the analyzed logical plan would list every
    // relation column and defeat the pruning assertion
    df.queryExecution.executedPlan.toString

  test("q6: filters reach the parquet scan and columns are pruned") {
    val df = Relational.q6ForecastRevenue(spark, sfDir)
    val s = scanInfo(df)
    assert(s.contains("PushedFilters:"))
    // pruned read schema: only the 4 referenced columns, no returnflag
    assert(s.contains("l_shipdate") && !s.contains("l_returnflag"))
  }

  test("q4: dimension chain joins are broadcast, fact side never shuffles") {
    val p = plan(Relational.q4RegionSuppliers(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("LSH dedup queries contain no cartesian/nested-loop join") {
    Seq(
      Dedup.q31MinHashDedup(spark, sfDir),
      Dedup.q32SimHashDedup(spark, sfDir),
      Dedup.q33SourceJaccard(spark, sfDir),
      Dedup.q59IncrementalIngest(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.linesIterator.next())
      assert(!p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q34/q35 use the native dot product, not interpreted HOFs") {
    Seq(
      Similarity.q34CosinePairs(spark, sfDir),
      Similarity.q35KnnBrute(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("dot_f64"))
      assert(!p.contains("aggregate(zip_with"))
    }
  }

  test("q34 exact pair join is a block equality join, not a nested loop") {
    val p = plan(Similarity.q34CosinePairs(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.linesIterator.next())
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q41 builds no driver-side centroid literals") {
    // the centroid table must stay a (broadcast) DataFrame: the plan
    // should contain no array literal of centroid doubles
    val df = Similarity.q41KnnIvf(spark, sfDir)
    val p = df.queryExecution.analyzed.toString
    assert(!p.contains("array(-"), "centroids appear folded into literals")
  }

  test("q61 PQ scan is equality joins only and keeps arrays out of it") {
    val df = Similarity.q61KnnPq(spark, sfDir)
    val p = plan(df)
    // codebook assign/LUT/scan joins are all equality joins (sub /
    // (sub, code)); nothing in the PQ path may plan a nested loop —
    // unlike q41, whose bounded centroid crossJoin is the documented
    // exception
    assert(!p.contains("CartesianProduct"), p.linesIterator.next())
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // trained codebooks stay DataFrames — no driver-side literal arrays
    val a = df.queryExecution.analyzed.toString
    assert(!a.contains("array(-"), "codebooks appear folded into literals")
  }

  test("q65 IVFPQ keeps codebooks as DataFrames, no centroid literals") {
    // the coarse-quantizer crossJoin (bounded nlist rows) is the q41
    // exception; the PQ side must stay literal-free like q61
    val a = Similarity.q65KnnIvfPq(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(!a.contains("array(-"), "codebooks appear folded into literals")
  }

  test("q68 residual IVFPQ: literal-free and HOF-free in the N-row path") {
    val a = Similarity.q68KnnIvfPqRes(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(!a.contains("array(-"), "codebooks appear folded into literals")
    // the residual subtraction must be exploded codegen arithmetic,
    // never a lambda HOF over the vector arrays (CodegenFallback).
    // ZERO lambda HOFs survive in this plan: the k-means seeding
    // transform() sits behind Materialize's checkpoint cut, so any
    // occurrence is a regression
    assert(!a.contains("transform(") && !a.contains("zip_with("),
      "element-wise HOF leaked into the residual path")
  }

  test("q46/q49 candidate joins are equality joins, not nested loops") {
    // winnow-overlap joins on the fingerprint value; the range join
    // buckets time so the interval predicate never plans a per-key
    // nested loop
    Seq(
      Dedup.q46WinnowPairs(spark, sfDir),
      Advanced.q49RangeJoin(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.linesIterator.next())
      assert(!p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q38 as-of join is one window pass — no range join anywhere") {
    val p = plan(Advanced.q38AsofJoin(spark, sfDir))
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q1 aggregates run map-side partial first") {
    val p = plan(Relational.q1PricingSummary(spark, sfDir))
    assert(p.contains("partial_sum") || p.contains("partial"))
  }

  test("q57 bucketed join+agg plans ZERO shuffles end-to-end") {
    // Both sides are bucketed on the join key with equal bucket counts,
    // so scan → join → per-order agg all reuse the bucket partitioning.
    // Any Exchange here means the writer-side layout investment was
    // silently thrown away.
    val p = Layout.q57Core(spark, sfDir).queryExecution.executedPlan
      .toString
    assert(!p.contains("Exchange"), "bucketed join plan shuffles:\n" +
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    assert(p.contains("SelectedBucketsCount"),
      "scan does not report bucket selection — bucketing not picked up")
  }

  test("q58 priority filter prunes partition directories at plan time") {
    val df = Layout.q58PartitionPrune(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") &&
      p.contains("o_orderpriority"),
      "priority predicate is not a partition filter")
    // the filter must NOT degrade to a row-level parquet filter —
    // pruned directories are never opened at all (sparkPlan: the AQE
    // wrapper on executedPlan does not expose children to collect)
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(
      _.references.exists(_.name == "o_orderpriority")))
  }

  test("fingerprint-keyed operators plan no Window at all (hot-fp skew)") {
    // q30/q23 (and every exactDedup call site) key on the content
    // fingerprint, whose hottest value at corpus scale is shared by
    // billions of boilerplate/empty docs. A Window partitioned by fp
    // puts that whole group in ONE task and AQE cannot split a window
    // partition — so these operators must plan aggregates (+ joins)
    // only: min_by keeper / groupBy-count-join-back. Any WindowExec
    // here is the straggler shape creeping back in.
    import org.apache.spark.sql.execution.window.WindowExec
    // q50/q63 key on cluster_id / segment fingerprint — same skew
    // class: ONE boilerplate clump or segment can span a large corpus
    // fraction, so cluster size and the segment keeper must be
    // aggregates too (count-join-back / min(struct) carrying the text)
    Seq(
      "q30" -> Dedup.q30ExactDedup(spark, sfDir),
      "q23" -> TextAnalysis.q23Fingerprint(spark, sfDir),
      "q50" -> Dedup.q50DedupClusters(spark, sfDir),
      // q77 keys its keeper on cluster_id too — the max_by + count
      // aggregate must never regress to a rank window
      "q77" -> Dedup.q77ClusterKeeper(spark, sfDir),
      "q63" -> Dedup.q63SegmentDedup(spark, sfDir)).foreach {
      case (name, df) =>
        val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
        assert(wins.isEmpty, s"$name plans a Window over the fingerprint")
    }
  }

  test("q83 image dedup is window-free and cartesian-free: banded " +
    "equality join + aggregate keeper only") {
    // dHash values have hot collisions at corpus scale (boilerplate
    // images — solid banners, blank thumbnails — share one hash), so
    // the keeper must never plan a Window over the hash, and the
    // candidate stage must stay a (band, value) equality join — any
    // nested-loop/cartesian here is the all-pairs shape the banding
    // exists to remove
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Multimodal.q83ImageDedup(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty, "q83 plans a Window")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q83's candidate stage is not an equality join")
  }

  test("q19 per-group id sample is the bounded TopKAgg, not collect_list") {
    // collect_list buffers every id of a (source, lang) group before
    // slicing to 5 — an aggregation-buffer OOM at a billion-doc group.
    val a = TextAnalysis.q19SourceDigest(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(a.contains("topk_agg"), "q19 lost the bounded-buffer top-k")
    assert(!a.contains("collect_list"), "unbounded collect_list is back")
  }

  test("q64 plans no join and no window — per-row expressions only") {
    // the repetition signals are pure functions of one document; the
    // pre-rework shape (explode -> groupBy(doc, gram) -> groupBy(doc)
    // + two joins) shipped every bigram string of the corpus through
    // two exchanges — any join or window here is that shape returning
    val p = plan(TextAnalysis.q64RepetitionSignals(spark, sfDir))
    assert(!p.contains("Join"), "q64 regained a join")
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = TextAnalysis.q64RepetitionSignals(spark, sfDir)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty, "q64 plans a Window")
  }

  test("q72/q73 retrieval plans are window-free, cartesian-free, and " +
    "all scoring joins broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    Seq(
      Retrieval.q72Bm25TopK(spark, sfDir),
      Retrieval.q73HybridRrf(spark, sfDir)).foreach { df =>
      val sp = df.queryExecution.sparkPlan
      val p = sp.toString
      // top-k is the bounded TopKAgg, never a per-query window (at
      // scale a window would sort every candidate on |queries| tasks)
      assert(sp.collect { case w: WindowExec => w }.isEmpty,
        "retrieval plans a Window")
      assert(p.contains("topk_agg"))
      // the only nested-loop is the broadcast 1-row stats cross join;
      // a true cartesian (unbroadcast) must never appear
      assert(!p.contains("CartesianProduct"), p.linesIterator.next())
      // query terms / df / stats joins are all broadcast — nothing in
      // the scoring path may shuffle-sort the posting stream
      assert(!p.contains("SortMergeJoin"))
    }
  }

  test("q74 posting/df scans statically prune to the query terms' " +
    "pfx partitions") {
    val df = LexIndex.q74Bm25TopKIdx(spark, sfDir)
    val s = scanInfo(df)
    // both persisted-table scans must carry a NON-EMPTY pfx partition
    // filter — an unpruned read scans the corpus-wide posting table
    // and the whole point of the layout is lost
    val pruned = "PartitionFilters: \\[[^\\]]*pfx".r
      .findAllIn(s).length
    assert(pruned >= 2, s"expected pfx partition filters on tf AND df")
    // same bounded-top-k discipline as q72
    import org.apache.spark.sql.execution.window.WindowExec
    assert(df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.isEmpty)
    assert(s.contains("topk_agg"))
  }

  test("no query plans a partition-less WindowExec (single-task funnel)") {
    // A Window with an empty partitionSpec moves EVERY row through one
    // task — the classic silent scale-killer. Sweep the entire driver
    // surface so no refactor can reintroduce one.
    import org.apache.spark.sql.execution.window.WindowExec
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val global = fn(spark, sfDir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty, s"$name plans a partition-less Window")
    }
  }
}
