package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin is result-identical to the plain equi-join") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val users = graft.sources.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = events.join(users, col("user_id") === col("c_custkey"))
      .select("event_id", "c_mktsegment")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(events, users,
        col("user_id"), col("c_custkey"), col("event_id"), salts = 8)
      .select("event_id", "c_mktsegment")
      .as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("saltedJoin multiset-matches the plain join under duplicate keys " +
    "on BOTH sides (randomized)") {
    // duplicate right-side keys mean several matches per left row, and
    // duplicate left rows mean output multiplicity matters — a salting
    // bug (wrong replication count, salt collision dropping a bucket)
    // shows up as a multiplicity difference a set compare would miss
    val rng = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val left = Seq.fill(300)((rng.nextInt(20).toLong,
        rng.nextInt(1000))).toDF("k", "lv")
      val right = Seq.fill(100)((rng.nextInt(20).toLong,
        rng.nextInt(1000))).toDF("rk", "rv")
      def counts(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "lv", "rv").as[(Long, Int, Int)]
          .collect().groupBy(identity).map { case (r, g) => (r, g.length) }
      val plain = counts(left.join(right, col("k") === col("rk")))
      val salted = counts(Skew.saltedJoin(left, right,
        col("k"), col("rk"), col("lv"), salts = 1 + rng.nextInt(7)))
      assert(salted === plain, s"trial $trial")
      assert(plain.nonEmpty)
    }
  }

  test("saltedJoin leaves a caller's own __salt column intact") {
    // the synthetic salt must pick a non-colliding name — a fixed
    // "__salt" would overwrite (withColumn replaces) and then drop the
    // caller's column, silently breaking result-identity
    import spark.implicits._
    val l = Seq((1L, 10L, "keepL"), (2L, 20L, "keepL2"))
      .toDF("id", "k", "__salt")
    val r = Seq((10L, "keepR"), (20L, "keepR2")).toDF("rk", "__salt")
    val out = Skew.saltedJoin(l, r, col("k"), col("rk"), col("id"), 4)
    assert(out.columns.count(_ == "__salt") === 2) // both sides survive
    val rows = out.select(col("id"), l("__salt"), r("__salt"))
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set((1L, "keepL", "keepR"), (2L, "keepL2", "keepR2")))
  }

  test("saltedSumCount matches the direct aggregation exactly") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val direct = events.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .as[(Long, Long, Double)].collect().toSet
    val salted = Skew.saltedSumCount(events, col("user_id"),
        col("value"), col("event_id"), salts = 16)
      .as[(Long, Long, Double)].collect().toSet
    // DECIMAL partials → bit-identical merge in any grouping
    assert(salted === direct)
  }
}
