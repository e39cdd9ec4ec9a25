package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins: both fact tables bucketed+sorted on the
  * join key join with NO exchange — the pre-shuffle pattern for a join
  * repeated across many pipeline runs at 100 TB (pay the shuffle once
  * at write time, never again). */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("orders_b")
    Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), plan)

    // and it computes the right thing
    val n = joined.count()
    val want = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(n === want)
  }
}
