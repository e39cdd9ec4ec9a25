package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AdvancedSpec extends SparkSpec {

  import spark.implicits._

  test("q24 counts term frequency, not distinct presence") {
    val rows = Advanced.q24TopTokens(spark, sfDir)
      .as[(String, Long)].collect()
    assert(rows.length === 20)
    // counts are non-increasing with the deterministic tie-break
    val ns = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // top token must occur more often than there are documents (word
    // salad repeats tokens within a doc) — proves TF not doc-frequency
    val nDocs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(ns.head > nDocs)
  }

  test("q37 centroids: n_vecs sums to corpus size per position") {
    val rows = Advanced.q37LabelCentroids(spark, sfDir).collect()
    val total = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    val byPos = rows.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byPos.values.toSet === Set(total))
    // centroids of unit-ish vectors stay well inside the unit ball
    assert(rows.forall(r => math.abs(r.getDouble(2)) < 1.0))
  }

  test("q38 as-of join matches a per-event brute-force lookup") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts").as[(Long, Long, java.sql.Timestamp)]
      .collect()
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val byCust = orders.groupBy(_._1)
    def expect(user: Long, ts: java.sql.Timestamp): Option[(Long, java.sql.Timestamp)] = {
      val cands = byCust.getOrElse(user, Array.empty)
        .filter(o => !o._3.after(ts))
      if (cands.isEmpty) None
      // latest date; tie → smallest orderkey (the deterministic keeper)
      else {
        val best = cands.maxBy(o => (o._3.getTime, -o._2))
        Some((best._2, best._3))
      }
    }
    val got = Advanced.q38AsofJoin(spark, sfDir).collect()
    assert(got.length === events.length)
    val gotMap = got.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None
       else Some((r.getLong(3), r.getTimestamp(4))))).toMap
    events.foreach { case (eid, user, ts) =>
      assert(gotMap(eid) === expect(user, ts), s"event $eid")
    }
  }

  test("q51: int8 quantization error sits in the predicted band") {
    // symmetric Q8: per-dim error is uniform-ish in [-scale/2, scale/2],
    // so mse ≈ avg_scale²/12; assert the order of magnitude, not the
    // constant (the data need not be uniform)
    val rows = Advanced.q51QuantizeEmbed(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mse = r.getDouble(2)
      val s = r.getDouble(3)
      assert(mse > 0 && mse < s * s / 2, s"label ${r.get(0)}: mse=$mse scale=$s")
    }
  }

  test("q51 core: an all-zero embedding yields null mse, not NaN or a crash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("z", Array(0.0f, 0.0f, 0.0f)),
      ("a", Array(1.0f, -0.5f, 0.25f)))
      .toDF("label", "embedding")
    val rows = Advanced.quantizeEmbed(df.withColumn("embedding",
        col("embedding").cast("array<float>")))
      .collect().map(r => r.getString(0) -> r).toMap
    // zero vector: every error term nulled out → sums are null
    assert(rows("z").isNullAt(2) && rows("z").isNullAt(3))
    // normal vector unaffected by the guard
    assert(!rows("a").isNullAt(2) && rows("a").getDouble(3) > 0)
  }

  test("q49: bucketized range join equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val naive = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          (col("b.us") - col("a.us")).between(0, Advanced.rangeJoinBucketUs) &&
          (col("a.us") < col("b.us") ||
            (col("a.us") === col("b.us") &&
              col("a.event_id") < col("b.event_id"))))
      .groupBy(col("a.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Advanced.q49RangeJoin(spark, sfDir)
      .select("user_id", "n_pairs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive && got.nonEmpty)
  }
}
