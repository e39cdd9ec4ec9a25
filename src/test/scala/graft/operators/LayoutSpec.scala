package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Layout operators: the bucketed / partitioned rewrites must be
  * physical-only — same rows out as the same query over the original
  * parquet — and idempotent within a session (the bench runs each
  * query 3×; only the first call may pay the write). */
class LayoutSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("q57 over bucketed tables equals the same join on raw parquet") {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val raw = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
             col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
    assert(canon(Layout.q57BucketJoin(spark, sfDir)) === canon(raw))
  }

  test("q58 over partitioned layout equals the filter on raw parquet") {
    val raw = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_total"))
    assert(canon(Layout.q58PartitionPrune(spark, sfDir)) === canon(raw))
    assert(Layout.q58PartitionPrune(spark, sfDir).count() > 0)
  }

  test("layout root is a conf seam (cluster shared-storage path)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_layout_conf").toString
    spark.conf.set("spark.graft.layout.root", root)
    try {
      val dir = Layout.partitionedOrders(spark, sfDir)
      assert(dir.startsWith(root))
      assert(new java.io.File(dir, "_SUCCESS").exists())
      // per-run scratch seam: unique subdirs under the configured root
      spark.conf.set("spark.graft.scratch.dir", root)
      val a = graft.Scratch.tempDir(spark, "p")
      val b = graft.Scratch.tempDir(spark, "p")
      assert(a.startsWith(s"$root/p-") && b.startsWith(s"$root/p-") && a != b)
    } finally {
      spark.conf.unset("spark.graft.layout.root")
      spark.conf.unset("spark.graft.scratch.dir")
    }
  }

  test("layout writes are idempotent: second call reuses, results stable") {
    val first = canon(Layout.q57BucketJoin(spark, sfDir))
    // table already registered now — this must not rewrite or drift
    val second = canon(Layout.q57BucketJoin(spark, sfDir))
    assert(first === second)
  }

  test("q62 over z-ordered layout equals the filter on raw parquet") {
    val raw = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").between(Layout.zDateLo, Layout.zDateHi) &&
        col("l_partkey") <= Layout.zPartHi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
             col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
    assert(canon(Layout.q62ZorderSkip(spark, sfDir)) === canon(raw))
    assert(Layout.q62ZorderSkip(spark, sfDir).count() > 0)
  }

  test("q62 predicates reach the parquet scan as pushed filters") {
    val s = Layout.q62ZorderSkip(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters:") && s.contains("l_partkey") &&
      s.contains("l_shipdate"))
  }

  test("z-value interleaves bits (locality sanity)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect().toSeq
    // spread(0xFFFF) = 0x55555555; b occupies odd bits; interleave(3,5)
    // = 0b100111 = 39
    assert(got === Seq(0L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL,
      1L, 2L, 39L))
  }

  test("z-order skips files on BOTH dimensions; a linear sort cannot") {
    // Per-file min/max is exactly what parquet footers / a
    // Delta-style manifest serve a reader. Count files whose stats
    // overlap each predicate under (a) the z-order layout and (b) a
    // linear sort on shipdate only, from the same row count and file
    // count. The z-layout must skip on EITHER dimension; the linear
    // layout cannot skip on the non-sort column — that asymmetry, not
    // an absolute ratio, is the claim (robust to fixture skew).
    val zdir = Layout.zorderedLineitem(spark, sfDir)
    val ldir = java.nio.file.Files
      .createTempDirectory("graft_linear_layout").toString
    try {
    Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_shipdate")
      .repartitionByRange(Layout.ZFiles, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(ldir)
    def overlap(dir: String, pred: (Column, Column, Column, Column) => Column)
        : (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_shipdate")).as("dlo"), max(col("l_shipdate")).as("dhi"),
          min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"))
      (stats.filter(pred(col("dlo"), col("dhi"), col("plo"), col("phi")))
        .count(), stats.count())
    }
    // partkey-only predicate: the dimension the linear layout ignores
    val pPred = (dlo: Column, dhi: Column, plo: Column, phi: Column) =>
      plo <= Layout.zPartHi
    // shipdate-only predicate: the dimension both layouts serve
    val dPred = (dlo: Column, dhi: Column, plo: Column, phi: Column) =>
      dhi >= lit(Layout.zDateLo) && dlo <= lit(Layout.zDateHi)
    val (zp, zn) = overlap(zdir, pPred)
    val (lp, ln) = overlap(ldir, pPred)
    val (zd, _) = overlap(zdir, dPred)
    info(s"partkey-pred files: z-order $zp/$zn vs linear $lp/$ln; " +
      s"shipdate-pred files: z-order $zd/$zn")
    // linear-by-shipdate sees ~every file for a partkey predicate
    assert(lp >= (ln * 9) / 10, s"fixture partkeys unexpectedly sorted: $lp/$ln")
    // z-order skips a meaningful share on the SAME predicate
    assert(zp <= (zn * 6) / 10, s"z-layout skipped nothing on partkey: $zp/$zn")
    // and still skips on the shipdate dimension too
    assert(zd <= (zn * 7) / 10, s"z-layout skipped nothing on shipdate: $zd/$zn")
    } finally {
      val (lfs, lp_) = graft.Scratch.fs(spark, ldir)
      lfs.delete(lp_, true)
    }
  }
}
