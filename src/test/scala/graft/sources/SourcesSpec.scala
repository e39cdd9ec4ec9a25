package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source round-trips beyond parquet — the reference's fixtures are
  * CSVs (reference tests/__init__.py:36); Spark's readers cover CSV and
  * JSON with explicit schemas (schema inference is a full extra pass —
  * never at 100 TB). */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  test("CSV round trip with explicit schema (quotes and newlines)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq(
      (1L, "plain", 1.5),
      (2L, "with \"quote\"", 2.5),
      (3L, "with\nnewline", 3.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("id LONG, s STRING, v DOUBLE")
      .option("header", "true")
      .option("multiLine", "true") // embedded newline golden
      .csv(dir)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      df.orderBy("id").as[(Long, String, Double)].collect().toSeq)
  }

  test("JSON lines round trip preserves nested props") {
    val dir = Files.createTempDirectory("graft_json").toString
    graft.sources.Tables.events(spark, sfDir)
      .limit(100)
      .write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .json(dir)
    assert(back.count() === 100)
    val k = back.withColumn("k",
      get_json_object(col("props"), "$.k").cast("int"))
    assert(k.filter(col("k").isNotNull).count() > 0)
  }
}
