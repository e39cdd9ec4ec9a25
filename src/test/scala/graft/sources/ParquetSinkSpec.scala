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

  // --- reference-compatible single-object layout (export.py:354-360) ---

  test("singleFile create writes ONE object at schema/table.parquet") {
    val base = tmpBase()
    val cfg = ParquetSink.Config(base, "t", "s", Method.Create,
      singleFile = true)
    ParquetSink.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), cfg)
    val f = new java.io.File(s"$base/s/t.parquet")
    assert(f.isFile, "expected a plain file, not a part-file directory")
    // read-back golden: a reference-era consumer sees one parquet object
    val got = spark.read.parquet(f.toString)
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "b")))
  }

  test("singleFile upsert round-trips through the one-object layout") {
    val base = tmpBase()
    ParquetSink.write(Seq((1, "A"), (2, "B")).toDF("id", "x"),
      ParquetSink.Config(base, "t", "s", Method.Create, singleFile = true))
    ParquetSink.write(Seq((2, "X"), (3, "C")).toDF("id", "x"),
      ParquetSink.Config(base, "t", "s", Method.Upsert, Seq("id"),
        singleFile = true))
    val f = new java.io.File(s"$base/s/t.parquet")
    assert(f.isFile)
    val got = spark.read.parquet(f.toString)
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "A"), (2, "X"), (3, "C")))
  }

  test("singleFile overwrite leaves no __old debris and survives a " +
    "staged-rename failure with the previous object intact") {
    // the overwrite path renames the live object ASIDE (never
    // delete-then-rename — a crash between those would leave NO live
    // copy); after a successful replace the aside copy is cleaned up
    val base = tmpBase()
    ParquetSink.write(Seq((1, "A")).toDF("id", "x"),
      ParquetSink.Config(base, "t", "s", Method.Create, singleFile = true))
    ParquetSink.write(Seq((1, "B")).toDF("id", "x"),
      ParquetSink.Config(base, "t", "s", Method.Create, singleFile = true))
    val dir = new java.io.File(s"$base/s")
    // ignore LocalFileSystem checksum sidecars (dot-prefixed .crc)
    assert(dir.listFiles().map(_.getName).filterNot(_.startsWith("."))
      .sorted.toSeq === Seq("t.parquet"),
      dir.listFiles().map(_.getName).mkString(","))
    assert(spark.read.parquet(s"$base/s/t.parquet")
      .as[(Int, String)].collect().toSeq === Seq((1, "B")))
  }

  test("singleFile append lands table/table_<stamp>.parquet per call") {
    val base = tmpBase()
    ParquetSink.write(Seq((1, "a")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Append, singleFile = true))
    ParquetSink.write(Seq((2, "b")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Append, singleFile = true))
    val dir = new java.io.File(s"$base/s/t")
    val files = dir.listFiles().filter(_.getName.matches("t_\\d+\\.parquet"))
    assert(files.length === 2, dir.listFiles().map(_.getName).mkString(","))
    assert(spark.read.parquet(files.map(_.toString): _*).count() === 2)
  }

  test("append stamps are strictly increasing even within one " +
    "millisecond (no silent same-name overwrite)") {
    // two appends in the same millisecond would otherwise produce the
    // SAME <table>_<millis>.parquet name, and the second would replace
    // the first — 1000 back-to-back calls guarantee same-millis
    // pressure that wall-clock alone cannot deduplicate
    val stamps = (1 to 1000).map(_ => ParquetSink.appendStamp())
    assert(stamps.distinct.size === 1000)
    assert(stamps === stamps.sorted)
  }

  test("singleFile rejects hive partitioning") {
    intercept[IllegalArgumentException] {
      ParquetSink.write(Seq((1, "a")).toDF("id", "v"),
        ParquetSink.Config(tmpBase(), "t", "s", Method.Create,
          partitionBy = Seq("v"), singleFile = true))
    }
  }

  test("upsert refuses a key-duplicated EXISTING table instead of " +
    "silently multiplying rows through the full-outer join") {
    val base = tmpBase()
    ParquetSink.write(Seq((1, "a")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Create))
    // a prior append lands the same key again — legal for append
    ParquetSink.write(Seq((1, "a2")).toDF("id", "v"),
      ParquetSink.Config(base, "t", "s", Method.Append))
    val e = intercept[graft.checks.UpsertError] {
      ParquetSink.write(Seq((1, "new")).toDF("id", "v"),
        ParquetSink.Config(base, "t", "s", Method.Upsert, Seq("id")))
    }
    assert(e.getMessage.contains("existing table"))
    // and the on-disk table is untouched by the refused upsert
    assert(spark.read.parquet(s"$base/s/t.parquet").count() === 2)
  }
}
