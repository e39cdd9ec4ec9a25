package graft.operators


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Physical data layout operators: writer-side bucketing and Hive-style
  * partitioned layout, plus the queries that exploit them.
  *
  * The reference (zypp-io/df_to_azure) has no notion of table layout —
  * it hands a staged CSV to ADF and lets SQL Server index it
  * (reference df_to_azure/export.py:141-166). At 100 TB the layout IS
  * the query plan: a fact-fact join between tables bucketed on the join
  * key needs NO shuffle at read time (each bucket pair is co-located),
  * and a filter on a partition directory column prunes whole
  * directories at PLANNING time, before a single row-group footer is
  * read. Both are writer-side investments that every downstream query
  * amortizes — exactly the trade a nightly 100 TB ingest should make.
  *
  * Both layouts are materialized once per scale-factor dir under
  * [[graft.Scratch.layoutRoot]] (local tmpdir by default; set
  * `spark.graft.layout.root` to shared storage on a cluster) and
  * reused across calls in the same JVM (the driver's bench runs each
  * query 3×; only the first pays the write).
  *
  * Correctness contract: layout is physical only — q57/q58 hash-match
  * DuckDB oracles that read the ORIGINAL un-bucketed, un-partitioned
  * parquet, proving the rewrite changes no query result.
  */
object Layout {

  private val dec = DecimalType(18, 2)
  private def d(c: Column): Column = c.cast(dec)

  /** Collision-proof per-sfDir tag (see [[graft.Scratch.pathTag]]). */
  private def tag(sfDir: String): String = graft.Scratch.pathTag(sfDir)

  private def layoutRoot(spark: SparkSession, sfDir: String): String =
    s"${graft.Scratch.layoutRoot(spark)}/${tag(sfDir)}"

  /** The one directory holding every Layout artifact for `sfDir`
    * (bucketed join tables, partitioned orders, z-ordered lineitem) —
    * the bench deletes it for a COLD prebuild, same lifecycle contract
    * as IndexStore.dirFor. */
  def dirFor(spark: SparkSession, sfDir: String): String =
    layoutRoot(spark, sfDir)

  /** Build every layout artifact for `sfDir` up front. The bench calls
    * this ONCE before its timing loop (after deleting [[dirFor]]), so
    * the q57/q58/q62 medians carry pure read-side serving and the
    * write-side investment is its own `layout_build_sec` field —
    * without this, a wiped tmpdir (the driver environment's /tmp
    * hygiene, BENCH_r18's q57 2.2×) lands the one-time rewrite inside
    * a timed run. Also drops the stale catalog entries first: the
    * bucketed-table ensure is keyed on tableExists, and a catalog
    * entry surviving a deleted data dir would otherwise skip the
    * rebuild and serve a missing-file scan. */
  def ensureAll(spark: SparkSession, sfDir: String): Unit = {
    Seq(s"orders_bkt_${tag(sfDir)}", s"lineitem_bkt_${tag(sfDir)}")
      .foreach { tbl =>
        if (spark.catalog.tableExists(tbl)) {
          val (f, p) = graft.Scratch.fs(spark,
            s"${layoutRoot(spark, sfDir)}/$tbl")
          if (!f.exists(p)) spark.sql(s"DROP TABLE `$tbl`")
        }
      }
    bucketedTable(spark, sfDir, "orders", "o_orderkey",
      Seq("o_orderkey", "o_orderpriority"))
    bucketedTable(spark, sfDir, "lineitem", "l_orderkey",
      Seq("l_orderkey", "l_extendedprice", "l_discount"))
    partitionedOrders(spark, sfDir)
    zorderedLineitem(spark, sfDir)
  }

  /** Number of buckets for the co-located join tables. Fixed, and the
    * SAME on both sides — equal bucket counts on the join key are what
    * let Spark plan the join with zero Exchange. Bucket count also caps
    * the join's parallelism (one task per bucket), so it must match the
    * compute width: 32 here (= the local[32] harness), thousands at
    * cluster scale so one bucket ≈ one task's worth of 100 TB. */
  val JoinBuckets = 32

  /** Write `src` as a bucketed+sorted EXTERNAL table (idempotent per
    * session+sfDir) and return its catalog name.
    *
    * `repartition(buckets, key)` before the write gives exactly ONE
    * file per bucket, which is what lets the scan report its sort
    * order to the planner (multi-file buckets force a Sort node —
    * still no shuffle, but the one-file form is the shape a production
    * nightly-compaction job would emit). */
  private def bucketedTable(spark: SparkSession, sfDir: String,
      src: String, key: String, cols: Seq[String]): String = {
    val tbl = s"${src}_bkt_${tag(sfDir)}"
    if (!spark.catalog.tableExists(tbl)) {
      Tables.load(spark, sfDir, src)
        .select(cols.map(col): _*)
        .repartition(JoinBuckets, col(key))
        .write.mode("overwrite")
        .option("path", s"${layoutRoot(spark, sfDir)}/$tbl")
        .bucketBy(JoinBuckets, key)
        .sortBy(key)
        .saveAsTable(tbl)
    }
    tbl
  }

  /** q57 core (unsorted): orders⋈lineitem on the bucket key, then a
    * per-order aggregate. Every stage reuses the bucket partitioning:
    * scan → zip-join → agg with ZERO Exchange nodes ([[graft.operators
    * .PlanCheckSpec]] pins this). Grouping on (o_orderkey,
    * o_orderpriority) is satisfied by hashpartitioning(o_orderkey)
    * because the grouping keys are a superset of the partitioning key. */
  private[operators] def q57Core(spark: SparkSession,
      sfDir: String): DataFrame = {
    val ord = spark.table(bucketedTable(spark, sfDir, "orders",
      "o_orderkey", Seq("o_orderkey", "o_orderpriority")))
    val li = spark.table(bucketedTable(spark, sfDir, "lineitem",
      "l_orderkey", Seq("l_orderkey", "l_extendedprice", "l_discount")))
    // MERGE hint: a fact-fact join must never broadcast — at 100 TB
    // neither side fits, and the whole point of the bucketed layout is
    // a zip-join of co-located buckets. Without the hint the tiny test
    // fixture would broadcast (a BroadcastExchange — correct for a
    // small side, but not the shape this operator exists to prove).
    ord.hint("merge").join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        sum(d(col("l_extendedprice")) *
            (lit(1).cast(dec) - d(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Shuffle-free fact-fact join over bucketed tables (the public,
    * deterministically ordered surface — the ORDER BY is the only
    * Exchange in the whole plan). */
  def q57BucketJoin(spark: SparkSession, sfDir: String): DataFrame =
    q57Core(spark, sfDir).orderBy(col("o_orderkey"))

  /** Write orders partitioned by `o_orderpriority` (5 directories),
    * idempotent per sfDir across JVMs (`_SUCCESS` marker). A real
    * deployment would partition the ingest date column; priority keeps
    * the directory fan-out fixture-independent. */
  private[operators] def partitionedOrders(spark: SparkSession,
      sfDir: String): String = {
    val dir = s"${layoutRoot(spark, sfDir)}/orders_part"
    val (mfs, marker) = graft.Scratch.fs(spark, dir + "/_SUCCESS")
    if (!mfs.exists(marker)) {
      Tables.load(spark, sfDir, "orders")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(dir)
    }
    dir
  }

  /** q58: monthly urgent-order stats off the partitioned layout. The
    * `o_orderpriority = '1-URGENT'` predicate is a PartitionFilter —
    * 4 of 5 directories are eliminated during planning and never
    * touch the scan (PlanCheckSpec pins `PartitionFilters` and the
    * pruned partition count). The oracle reads the original
    * unpartitioned parquet: layout changes nothing. */
  def q58PartitionPrune(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(partitionedOrders(spark, sfDir))
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(d(col("o_totalprice"))).cast(DoubleType).as("sum_total"))
      .orderBy(col("o_month"))

  // --- Z-order layout -------------------------------------------------------

  /** Target file count for the z-ordered layout: `repartitionByRange`
    * on the z-value gives one file per contiguous z-range, so each
    * file's (shipdate × partkey) bounding box is a compact quad-tree
    * region. 64 here; at 100 TB the same code with file-sized ranges
    * (the nightly-compaction shape again). */
  val ZFiles = 64

  /** Per-dimension z resolution: 16 bits — two spread 16-bit ranks
    * interleave into one 32-bit key that fits comfortably in a LONG. */
  private val zMax = (1 << 16) - 1

  /** Morton spread of a 16-bit value: bit i moves to position 2i (the
    * classic 4-step magic-mask dilation). Pure shift/and/or — stays in
    * whole-stage codegen, no UDF. */
  private def spread(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleaved z-value of two already-scaled 16-bit ranks. */
  private[operators] def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Scale `c` to a 16-bit rank inside [lo, hi] (inclusive bounds from
    * the same dataset — a degenerate hi = lo maps everything to 0). */
  private def zRank(c: Column, lo: Column, hi: Column): Column =
    least(floor((c - lo).cast(DoubleType) /
      greatest((hi - lo).cast(DoubleType), lit(1.0)) * (zMax + 1)),
      lit(zMax.toDouble)).cast("long")

  /** Write lineitem Z-ORDERED on (l_shipdate, l_partkey), idempotent
    * per sfDir across JVMs (`_SUCCESS` marker); returns the directory.
    *
    * Why a space-filling curve and not a sort: a linear sort on one
    * column gives min/max file skipping on THAT column only — a
    * predicate on the other column overlaps every file. Interleaving
    * the bits of both columns' 16-bit ranks makes each output file a
    * compact box in BOTH dimensions, so single-column predicates on
    * either column — and conjunctions — skip most files from footer
    * stats alone (the Delta/Iceberg OPTIMIZE ZORDER trade, here as a
    * plain writer-side operator producing ordinary parquet).
    *
    * Column bounds feed in through a 1-row aggregate joined on a
    * constant key — an equality broadcast join, no driver round-trip,
    * no literal folding (the layout stays one lazy DAG). The z-key
    * itself is shift/mask expressions inside codegen. */
  private[operators] def zorderedLineitem(spark: SparkSession,
      sfDir: String): String = {
    val dir = s"${layoutRoot(spark, sfDir)}/lineitem_zorder"
    val (mfs, marker) = graft.Scratch.fs(spark, dir + "/_SUCCESS")
    if (!mfs.exists(marker)) {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_shipdate", "l_returnflag",
          "l_extendedprice", "l_discount")
      val bounds = li.agg(
        min(col("l_shipdate")).as("d_lo"), max(col("l_shipdate")).as("d_hi"),
        min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"))
      li.withColumn("one", lit(1))
        .join(broadcast(bounds.withColumn("one", lit(1))), Seq("one"))
        .withColumn("z", zValue(
          zRank(datediff(col("l_shipdate"), col("d_lo")), lit(0),
            datediff(col("d_hi"), col("d_lo"))),
          zRank(col("l_partkey"), col("p_lo"), col("p_hi"))))
        .drop("one", "d_lo", "d_hi", "p_lo", "p_hi")
        .repartitionByRange(ZFiles, col("z"))
        .sortWithinPartitions(col("z"))
        // the synthetic key ordered the rows; persisting it would tax
        // every future scan of the copy (the projection sits above the
        // sort, so row order survives the drop)
        .drop("z")
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** q62 box predicate: a shipdate window AND a partkey prefix — both
    * dimensions constrained, the case a single-column sort can serve
    * only one side of. The fixture's ship timestamps span 1995–2001 at
    * every SF and partkeys start at 0, so the window is non-empty at
    * any SF; the partkey cut selects ~25% at the spec's sf0.001 (its
    * absolute fraction shrinks at larger SF — only selectivity > 0
    * matters for correctness). */
  private[graft] val zDateLo = "1996-01-01"
  private[graft] val zDateHi = "1997-12-31"
  private[graft] val zPartHi = 49L

  /** q62: revenue by return flag inside the box, read from the
    * z-ordered layout. Both predicates reach the parquet scan as
    * PushedFilters, and because every file is z-clustered its row-group
    * stats are tight in both dimensions — the reader skips most of the
    * table from footers alone (LayoutSpec measures the file-level
    * equivalent against per-file min/max, the same stats a
    * Delta/Iceberg manifest would serve). The oracle reads the ORIGINAL
    * un-ordered parquet: layout is physical only. */
  def q62ZorderSkip(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(zorderedLineitem(spark, sfDir))
      .filter(col("l_shipdate").between(zDateLo, zDateHi) &&
        col("l_partkey") <= zPartHi)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(d(col("l_extendedprice")) *
            (lit(1).cast(dec) - d(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
      .orderBy(col("l_returnflag"))
}
