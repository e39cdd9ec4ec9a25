package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ArgExtremumAgg: value-identical to Spark's max_by/min_by wherever
  * those are well-defined (unique ordering key per group), through the
  * full partial/merge/ser-de path, for struct orderings and struct or
  * array payloads — plus the plan-shape property the aggregate exists
  * for (ObjectHashAggregate, never sort-based per-group extremes). */
class ArgExtremumAggSpec extends SparkSpec {

  import ArgExtremumAgg.{maxByAgg, minByAgg}

  test("fuzz: agrees with max_by/min_by on struct ord + struct payload " +
    "across shuffled partials (unique ord per group)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val rows = (1 to 400).map { i =>
        // score collides on purpose; (score, -id) stays unique per group
        (rng.nextInt(20), rng.nextInt(7).toDouble, i.toLong,
          rng.nextInt(1000))
      }
      val df = rows.toDF("g", "score", "id", "v")
        .repartition(4, col("id")) // spread groups across partials
      val ord = struct(col("score"), (-col("id")).as("ni"))
      val pay = struct(col("v"), col("id"))
      val viaTyped = df.groupBy(col("g"))
        .agg(maxByAgg(pay, ord).as("k"))
        .select(col("g"), col("k.v"), col("k.id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val viaBuiltin = df.groupBy(col("g"))
        .agg(max_by(pay, ord).as("k"))
        .select(col("g"), col("k.v"), col("k.id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(viaTyped == viaBuiltin, s"trial $trial max")
      val minTyped = df.groupBy(col("g"))
        .agg(minByAgg(pay, ord).as("k"))
        .select(col("g"), col("k.v"), col("k.id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val minBuiltin = df.groupBy(col("g"))
        .agg(min_by(pay, ord).as("k"))
        .select(col("g"), col("k.v"), col("k.id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(minTyped == minBuiltin, s"trial $trial min")
    }
  }

  test("array payload survives buffer copy and ser/de; NaN ord ranks " +
    "greatest like the declarative forms") {
    import spark.implicits._
    val df = Seq(
      (1, 1.0, 10L, Array(1.0, 2.0)),
      (1, Double.NaN, 11L, Array(3.0, 4.0)),
      (1, 2.0, 12L, Array(5.0, 6.0)),
      (2, -0.0, 20L, Array(7.0)),
      (2, 0.0, 21L, Array(8.0))) // -0.0 == 0.0: unique tie-break below
      .toDF("g", "s", "id", "v")
      .repartition(3, col("id"))
    val ord = struct(col("s"), col("id"))
    val got = df.groupBy(col("g"))
      .agg(maxByAgg(col("v"), ord).as("v"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(got(1) == Seq(3.0, 4.0)) // NaN greatest, as in ORDER BY
    assert(got(2) == Seq(8.0))      // -0.0 == 0.0, id breaks the tie
  }

  test("null ord rows are ignored; an all-null group yields NULL " +
    "(max_by semantics)") {
    import spark.implicits._
    val df = Seq(
      (1, Option(5.0), 10L),
      (1, None, 11L),
      (2, None, 20L)).toDF("g", "s", "id")
    val got = df.groupBy(col("g"))
      .agg(maxByAgg(col("id"), col("s")).as("k"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(got == Map(1 -> Some(10L), 2 -> None))
  }

  test("plans as ObjectHashAggregate — the sort-free shape is the " +
    "point; the declarative struct forms sort-aggregate") {
    import spark.implicits._
    val df = spark.range(100)
      .select((col("id") % 10).as("g"), col("id"),
        (col("id") * 7 % 13).cast("double").as("s"))
    val typed = df.groupBy(col("g"))
      .agg(maxByAgg(col("id"), struct(col("s"), col("id"))).as("k"))
    typed.collect()
    val typedPlan = typed.queryExecution.executedPlan.toString
    assert(typedPlan.contains("ObjectHashAggregate"), typedPlan)
    assert(!typedPlan.contains("SortAggregate"), typedPlan)
    val builtin = df.groupBy(col("g"))
      .agg(max_by(col("id"), struct(col("s"), col("id"))).as("k"))
    builtin.collect()
    val builtinPlan = builtin.queryExecution.executedPlan.toString
    assert(builtinPlan.contains("SortAggregate"), builtinPlan)
  }

  test("non-orderable ordering key is rejected at analysis") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 1), 2L)).toDF("g", "m", "id")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("g")).agg(maxByAgg(col("id"), col("m"))).collect()
    }
  }
}
