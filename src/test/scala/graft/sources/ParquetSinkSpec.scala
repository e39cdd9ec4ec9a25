package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.checks.Validations.Method

/** Parquet-path round-trips (reference tests/test_parquet.py:18-117):
  * create overwrites, append accumulates, upsert applies the O15
  * two-branch semantics via a shadow-directory swap. */
class ParquetSinkSpec extends SparkSpec {

  import spark.implicits._

  private def tmpBase(): String =
    Files.createTempDirectory("graft_pq").toString

  test("create then read back; second create overwrites") {
    val base = tmpBase()
    val cfg = ParquetSink.Config(base, "t", "s", Method.Create)
    ParquetSink.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), cfg)
    assert(spark.read.parquet(ParquetSink.tablePath(cfg)).count() === 2)
    ParquetSink.write(Seq((9, "z")).toDF("id", "v"), cfg)
    val got = spark.read.parquet(ParquetSink.tablePath(cfg))
      .as[(Int, String)].collect()
    assert(got.toSeq === Seq((9, "z")))
  }

  test("append lands new files without touching old rows") {
    val base = tmpBase()
    ParquetSink.write(Seq((1, "a")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Create))
    ParquetSink.write(Seq((2, "b")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Append))
    assert(spark.read.parquet(s"$base/s/t.parquet").count() === 2)
  }

  test("upsert on existing data applies keyed row/cell semantics") {
    val base = tmpBase()
    ParquetSink.write(
      Seq((1, "A", "AA"), (2, "B", "BB"), (3, "C", "CC")).toDF("id", "x", "y"),
      ParquetSink.Config(base, "t", "s", Method.Create))
    ParquetSink.write(
      Seq((2, "X", "XX"), (4, "D", "DD")).toDF("id", "x", "y"),
      ParquetSink.Config(base, "t", "s", Method.Upsert, Seq("id")))
    val got = spark.read.parquet(s"$base/s/t.parquet")
      .orderBy("id").as[(Int, String, String)].collect().toSeq
    assert(got === Seq((1, "A", "AA"), (2, "X", "XX"), (3, "C", "CC"),
      (4, "D", "DD")))
  }

  test("upsert with no existing table behaves as create") {
    val base = tmpBase()
    ParquetSink.write(Seq((1, "a")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Upsert, Seq("id")))
    assert(spark.read.parquet(s"$base/s/t.parquet").count() === 1)
  }
}
