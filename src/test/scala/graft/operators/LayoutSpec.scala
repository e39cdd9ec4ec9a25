package graft.operators

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
}
