package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation utilities.
  *
  * First line of defense at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). Salting is
  * the static fallback for planners that must not rely on runtime
  * re-planning — e.g. a hot user_id owning 10% of a 100 TB event log,
  * joined against a per-user dimension too big to broadcast.
  */
object Skew {

  /** Salted equi-join, result-identical to
    * `left.join(right, leftKey === rightKey, "inner")`.
    *
    * The left (skewed) side spreads each hot key over `salts` shuffle
    * partitions via a deterministic hash of `leftSaltSource` (any
    * column set that varies within a key — e.g. the event id); the
    * right side is replicated `salts` times so every (key, salt) bucket
    * finds its match. Shuffle volume: right side × salts — the price of
    * removing the hot-key straggler. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftSaltSource: Column,
      salts: Int): DataFrame = {
    // the synthetic column name must not collide with either schema: a
    // fixed "__salt" would silently OVERWRITE (withColumn replaces) and
    // then DROP a caller's same-named column, breaking the documented
    // result-identity with the plain join
    val taken = (left.columns ++ right.columns).toSet
    val salt = Iterator.iterate("__salt")(_ + "_")
      .find(n => !taken.contains(n)).get
    val l = left.withColumn(salt, pmod(hash(leftSaltSource), lit(salts)))
    val r = right.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, leftKey === rightKey && l(salt) === r(salt))
      .drop(salt)
  }

  /** Two-stage salted aggregation: count + decimal sum per key with the
    * reduce state spread over `salts` partial groups first. Use when a
    * single key dominates and the per-key reduce would straggle (for
    * plain algebraic aggregates Spark's map-side combine usually
    * suffices; this is for the long tail where it doesn't). */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltSource: Column,
      salts: Int): DataFrame =
    df.select(key.as("key"),
        pmod(hash(saltSource), lit(salts)).as("__salt"),
        value.cast("decimal(18,2)").as("v"))
      .groupBy(col("key"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n"),
        sum(col("ps")).cast("double").as("sum_value"))

  /** q48: revenue per return flag through the SALTED two-stage
    * aggregate — an extreme-skew key (3 values over the whole fact
    * table) deliberately routed through [[saltedSumCount]] so the
    * mitigation itself is oracle-checked: the decimal partial sums make
    * the result bit-identical to a plain GROUP BY at any parallelism,
    * which is exactly the property that lets a planner salt a hot key
    * without changing answers. (For ordinary skew Spark's map-side
    * combine + AQE already handle this; the salt is the static fallback
    * the class doc describes.) */
  def q48SaltedHotkeys(spark: SparkSession, sfDir: String): DataFrame =
    saltedSumCount(
      Tables.load(spark, sfDir, "lineitem"),
      col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"), 16)
      .orderBy(col("key"))
}
