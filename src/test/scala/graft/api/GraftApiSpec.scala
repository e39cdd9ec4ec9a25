package graft.api

import java.nio.file.Files

import graft.SparkSpec
import graft.sql.DerbyDialect

/** End-to-end checks of the single public entry point (reference O1). */
class GraftApiSpec extends SparkSpec {

  import spark.implicits._

  test("parquet route: create then upsert through the public API") {
    val base = Files.createTempDirectory("graft_api").toString
    val df1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    assert(Graft.dfToTable(df1, "t", "s", base, parquet = true))
    val df2 = Seq((2, "B"), (3, "c")).toDF("id", "v")
    assert(Graft.dfToTable(df2, "t", "s", base, method = "upsert",
      idField = Seq("id"), parquet = true))
    val got = spark.read.parquet(s"$base/s/t.parquet")
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("jdbc route: create through the public API against Derby") {
    val url = "jdbc:derby:memory:graftapi;create=true"
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    assert(Graft.dfToTable(df, "api_t", "api_s", url, dialect = DerbyDialect))
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "\"api_s\".\"api_t\"").load().count()
    assert(got === 2)
  }

  test("parquet route honors singleFile (reference blob layout)") {
    val base = Files.createTempDirectory("graft_api_sf").toString
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Graft.dfToTable(df, "t", "s", base, parquet = true,
      singleFile = true))
    assert(new java.io.File(s"$base/s/t.parquet").isFile)
  }

  test("invalid method is rejected") {
    val df = Seq((1, "x")).toDF("id", "v")
    assertThrows[IllegalArgumentException] {
      Graft.dfToTable(df, "t", "s", "/tmp/x", method = "merge", parquet = true)
    }
  }

  test("empty frame is a no-op returning false") {
    val base = Files.createTempDirectory("graft_api2").toString
    val empty = Seq.empty[(Int, String)].toDF("id", "v")
    assert(!Graft.dfToTable(empty, "t", "s", base, parquet = true))
  }

  test("route-specific knobs are validated, not silently dropped: a " +
    "non-default SQL-only knob with parquet=true is refused, and " +
    "vice versa") {
    import graft.SparkSpec
    val df = Seq((1, "a")).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Graft.dfToTable(df, "t", "s",
        java.nio.file.Files.createTempDirectory("gk").toString,
        parquet = true, batchSize = 5000)
    }
    assert(e1.getMessage.contains("batchSize"))
    val e2 = intercept[IllegalArgumentException] {
      Graft.dfToTable(df, "t", "s", "jdbc:derby:memory:gk;create=true",
        singleFile = true)
    }
    assert(e2.getMessage.contains("singleFile"))
    // parquet-only knobs work on the parquet route
    val base = java.nio.file.Files.createTempDirectory("gk2").toString
    assert(Graft.dfToTable(Seq((1, "a", "p1"), (2, "b", "p2"))
      .toDF("id", "v", "part"), "t", "s", base,
      parquet = true, partitionBy = Seq("part")))
    assert(spark.read.parquet(s"$base/s/t.parquet")
      .where("part = 'p1'").count() === 1)
  }
}
