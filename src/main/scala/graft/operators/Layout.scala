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
}
