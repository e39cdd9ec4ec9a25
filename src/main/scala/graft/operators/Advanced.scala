package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Corpus statistics, vector aggregation, and the as-of join — operators
  * beyond the reference surface that a training-data pipeline needs.
  */
object Advanced {

  /** q24: heavy hitters — top-20 tokens by occurrence (with duplicates,
    * i.e. term frequency). One explode + one hash aggregate; at 100 TB
    * this is the map-side-combinable shape (partial counts per
    * partition, tiny shuffle on the token key). */
  def q24TopTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** q37: per-label embedding centroids as (label, pos, centroid) rows.
    *
    * Elements are quantized to fixed point (floor(v·1e6), at the float
    * noise floor) and summed as LONGs, so the aggregation is exact and
    * order-independent — double sums would differ per partitioning and
    * never hash-match an oracle, and engines disagree on float→DECIMAL
    * casts. The exact-fixed-point-sum pattern is also the right one for
    * a 1000-executor cluster: bit-identical results at any parallelism. */
  def q37LabelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    // non-finite elements are excluded from the SUM but still counted
    // (one poisoned vector must not crash the ANSI double→long cast —
    // floor(NaN/Inf) is uncastable — nor silently skew every centroid
    // of its label); the oracle states the identical CASE-guard, so
    // the two engines keep agreeing on poisoned corpora too
    val vd = col("v").cast("double")
    val finite = !isnan(vd) && abs(vd) =!= lit(Double.PositiveInfinity)
    Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(
        (sum(when(finite, floor(vd * 1e6).cast("long")))
          .cast("double") / 1000000.0 / count(lit(1))).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("pos"))
  }

  /** q25: discrete percentiles (p50/p90/p99 of extended price per return
    * flag) — `value at rank ceil(p*n)`, i.e. percentile_disc semantics,
    * in pure integer logic over exact values. Built-in continuous
    * percentiles interpolate in double and engines disagree at 1 ulp,
    * so the discrete form is the portable one.
    *
    * The rank is VALUE-BUCKETED, not a per-flag window: the group key
    * has ~3 values, so `Window.partitionBy(flag)` would sort a third
    * of the table in ONE task — fine at sf0.1, a wall at 100×.
    * Instead every row gets a bucket derived from its VALUE
    * (fixed-width price ranges — contiguous in the sort order by
    * construction), rank runs locally within (flag, bucket), and the
    * cumulative row counts of the flag's earlier buckets (a tiny side
    * aggregate, broadcast back) offset the local ranks into the
    * identical global rank. Parallelism scales with the bucket count
    * instead of the group-key cardinality, and — unlike an earlier
    * `repartitionByRange` revision — the bucketing is a pure function
    * of the data, so there are no sampled boundaries to pin with a
    * checkpoint and no extra full-table shuffle: just one window pass
    * plus one small aggregate. */
  val pctBucketWidth = 4096.0

  def q25Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("bucket",
        floor(col("l_extendedprice") / pctBucketWidth).cast("long"))
    val counts = li.groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col("l_returnflag")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n",
        sum(col("cnt")).over(Window.partitionBy(col("l_returnflag"))))
      .select(col("bucket"), col("l_returnflag"), col("off"), col("n"))
    // local rank within (flag, bucket): every task sorts only its own
    // value slice
    val wLocal = Window.partitionBy(col("l_returnflag"), col("bucket"))
      .orderBy(col("l_extendedprice"))
    val ranked = li.withColumn("rn_local", row_number().over(wLocal))
      .join(broadcast(offs), Seq("bucket", "l_returnflag"))
      .withColumn("rn", col("off") + col("rn_local"))
    val ps = Seq(0.5, 0.9, 0.99)
    // one explode instead of a 3-way union of filters — the union form
    // re-ran the whole window per percentile (visible as 3× the
    // exchanges in the audit)
    ranked
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("rn") === greatest(lit(1), ceil(col("p") * col("n"))))
      .select(col("l_returnflag"), col("p"), col("l_extendedprice").as("value"))
      .orderBy(col("l_returnflag"), col("p"))
  }

  /** q26: minimum edit distance per probe document (doc_id < 10) to any
    * other same-source document — exact Levenshtein (integer result,
    * engine-portable), quadratic only within the probe × source-shard
    * block. */
  def q26EditDistance(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val probes = d.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("source"),
        col("text").as("probe_text"))
    probes.join(d, Seq("source"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"))
      .agg(min(levenshtein(col("probe_text"), col("text"))).as("min_dist"))
      .orderBy(col("probe_id"))
  }

  /** q28: full cube over (returnflag, linestatus) — every grouping-set
    * combination including grand total. */
  def q28Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** q29: pivot — yearly order counts spread across status columns.
    * The pivot values are declared (no extra distinct scan) and the
    * oracle expresses the same thing as portable CASE aggregation. */
  def q29Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      // fill scoped to the PIVOT columns: an unqualified fill also
      // rewrites a NULL yr group key (null o_orderdate) to year 0,
      // where the CASE-aggregation oracle keeps NULL — a silent hash
      // mismatch the moment a corpus carries one null order date
      .na.fill(0L, Seq("O", "F", "P"))
      .orderBy(col("yr"))

  /** q27: calendar seasonality — order counts and decimal totals by
    * (year, month). */
  def q27Seasonality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("yr"), col("mo"))

  /** q39: batch sessionization — gaps-and-islands. Sessions split at a
    * 30-minute inactivity gap; session id is the running count of gap
    * flags per user. Two windows over the same (user_id, ts, event_id)
    * sort order — Spark reuses the sort — then one aggregate. This is
    * the batch twin of [[graft.streaming.StreamOps.userSessions]]
    * (session ends here are max(ts), not max(ts)+gap).
    */
  def q39Sessions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = ev.withColumn("prev_ts", lag(col("ts"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000,
          1).otherwise(0))
    flagged
      .withColumn("session_id",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q38: as-of join — each event picks the latest order of the same
    * customer with o_orderdate <= ts (LEFT semantics: events without
    * any qualifying order keep nulls).
    *
    * Spark has no ASOF JOIN operator; the scalable composition is the
    * union trick: tag order rows R and event rows L, sort each customer
    * partition by (time, tag) so an R at time t precedes an L at the
    * same t (inclusive <=), and carry the last seen order forward with
    * last(..., ignoreNulls) over an unbounded-preceding window. One
    * shuffle + one sort per key — no range cross join, no per-row probe;
    * this is how the pattern survives 100 TB. The right side is deduped
    * per (custkey, orderdate) with a deterministic keeper first, because
    * as-of tie-breaks would otherwise be engine-defined. */
  def q38AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val events = Tables.load(spark, sfDir, "events")

    // keeper = min orderkey per (custkey, orderdate): one declarative
    // min aggregate (r18, guide §2.3) — the former row_number window
    // shuffled and sorted every order row for a rank-1 filter; the
    // aggregate's map-side partials collapse to one row per group per
    // task, and min(o_orderkey) IS the (o_orderkey ASC) rank-1 value.
    val r = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(min(col("o_orderkey")).as("o_orderkey"))
      .select(
        col("o_custkey").as("key"),
        col("o_orderdate").as("t"),
        lit(0).as("tag"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("timestamp").as("ts"),
        col("o_orderkey"),
        col("o_orderdate"))
    val l = events.select(
      col("user_id").as("key"),
      col("ts").as("t"),
      lit(1).as("tag"),
      col("event_id"),
      col("ts"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("o_orderdate"))

    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("ts"),
        col("asof_orderkey"), col("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** q51: int8 embedding quantization quality — symmetric per-vector
    * scaling (scale = max|x|/127, the faiss/GGML-style Q8 scheme) and
    * the reconstruction-error profile per label. Storing 100 TB of
    * float32 embeddings as int8 + one scale is a 4× footprint cut;
    * this query is the acceptance check that the error stays where the
    * scheme predicts (mse ≈ scale²/12 per dimension).
    *
    * Shape: one scan, one explode, one map-side-combinable aggregate
    * (the q37 pattern). scale uses array_max/array_min (plain codegen'd
    * collection ops, not lambda HOFs); the squared errors and scales
    * aggregate in exact fixed point (floor(x·1e12) LONGs), so the
    * result is bit-identical at any parallelism AND to the DuckDB
    * oracle; round() ties break away from zero in both engines. */
  def q51QuantizeEmbed(spark: SparkSession, sfDir: String): DataFrame =
    quantizeEmbed(Tables.load(spark, sfDir, "embeddings"))

  /** Core of q51 over any (label, embedding) frame — factored out so
    * the spec can drive it with hand-built edge cases (zero vectors)
    * the parquet fixture doesn't contain. */
  def quantizeEmbed(embeddings: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val e = embeddings
      .select(col("label"), v.as("v"))
      .withColumn("scale",
        greatest(array_max(col("v")), -array_min(col("v"))) / 127.0)
    // an all-zero embedding has scale = 0: dividing by it is NaN in
    // Spark but a hard error in ANSI engines (the DuckDB oracle) —
    // null the scale out (nullif on the oracle side) so both engines
    // skip the row's error terms identically. A NaN/Inf COMPONENT is
    // the same class from the other direction (scale itself goes
    // non-finite, the === 0 guard misses it, and floor(NaN)→long is
    // an ANSI crash): null those scales too, mirrored by the oracle's
    // isfinite CASE — the poisoned row counts its dims and
    // contributes no error terms, exactly like the zero-vector rule
    val safeScale = when(col("scale") === 0.0 || isnan(col("scale")) ||
        abs(col("scale")) === lit(Double.PositiveInfinity), lit(null))
      .otherwise(col("scale"))
    val err = e.select(col("label"), safeScale.as("scale"), posexplode(col("v")))
      .withColumn("err",
        col("col") - round(col("col") / col("scale")) * col("scale"))
    err.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_dims"),
        sum(floor(col("err") * col("err") * 1e12).cast("long")).as("sse_fp"),
        sum(floor(col("scale") * 1e9).cast("long")).as("scale_fp"))
      .select(col("label"), col("n_dims"),
        (col("sse_fp").cast("double") / 1e12 / col("n_dims")).as("mse"),
        (col("scale_fp").cast("double") / 1e9 / col("n_dims")).as("avg_scale"))
      .orderBy(col("label"))
  }

  /** q55: top-3 orders per customer via MAP-SIDE PARTIAL TOP-K
    * ([[graft.functions.TopKAgg]]) — the scalable alternative to the
    * `row_number` window (q5's shape), which must shuffle+sort every
    * row of every group before discarding all but k. Here each map
    * task keeps a k-slot buffer per group, the shuffle carries at most
    * k·|groups| rows, and nothing is globally sorted. Results are
    * deterministic ((price DESC, orderkey ASC) is a total order) and
    * hash-match the window-based SQL oracle exactly. */
  def q55TopOrdersAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKAgg
        .topkAgg(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))

  /** Range-join bucket width: 1 hour in microseconds. */
  val rangeJoinBucketUs: Long = 3600L * 1000000L

  /** q49: bounded-range self-join — per-user pairs of events at most
    * one hour apart (ordered by time, event-id tie-break), aggregated
    * per user. A naive `a.ts < b.ts AND b.ts - a.ts <= 1h` predicate
    * plans a per-key nested loop (quadratic in each user's history);
    * instead both sides bucket time by the range width and the earlier
    * side fans out to {its bucket, bucket+1} — every qualifying pair
    * lands in exactly ONE (user, bucket) equality-join group (the
    * later event's own bucket), so there is no post-join dedup, the
    * shuffle key is high-cardinality, and the residual range predicate
    * only runs inside matching buckets. This is the standard bucketized
    * range-join shape (what Databricks' range-join hints do under the
    * hood), the time-interval analogue of q34's block pairing. */
  def q49RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val bucket = expr(s"us DIV ${rangeJoinBucketUs}L")
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
        col("us").as("us_a"),
        explode(array(bucket, bucket + 1)).as("bkt"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
        col("us").as("us_b"), bucket.as("bkt"))
    a.join(b, Seq("user_id", "bkt"))
      .filter(col("us_b") - col("us_a") >= 0 &&
        col("us_b") - col("us_a") <= rangeJoinBucketUs &&
        (col("us_a") < col("us_b") ||
          (col("us_a") === col("us_b") && col("id_a") < col("id_b"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("us_b") - col("us_a")).as("sum_gap_us"))
      .withColumn("avg_gap_s",
        col("sum_gap_us").cast("double") / col("n_pairs") / 1000000.0)
      .orderBy(col("user_id"))
  }
}
