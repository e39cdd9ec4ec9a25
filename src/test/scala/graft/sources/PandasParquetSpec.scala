package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.MessageTypeParser

import graft.SparkSpec
import graft.types.SqlTypeMapper
import graft.types.SqlTypeMapper.SqlNumeric

/** Pandas writes timedelta64 as bare INT64 + a `pandas` footer-metadata
  * block (verified against a real pandas-written file: the parquet
  * schema shows plain `optional int64`, the type survives only in
  * metadata). The fixture here reproduces that shape with the parquet
  * example writer so the reader path is tested end-to-end. */
class PandasParquetSpec extends SparkSpec {

  private val pandasMeta =
    """{"index_columns": [], "columns": [
      |  {"name": "id", "pandas_type": "int64", "numpy_type": "int64"},
      |  {"name": "elapsed", "pandas_type": "duration[ns]",
      |   "numpy_type": "timedelta64[ns]"}],
      | "pandas_version": "2.2.3"}""".stripMargin

  private def writePandasStyle(sub: String = ""): String = {
    val dir = Files.createTempDirectory("graft_pd").toString
    val leaf = if (sub.isEmpty) dir else s"$dir/$sub"
    new java.io.File(leaf).mkdirs()
    val file = s"$leaf/part-00000.parquet"
    val schema = MessageTypeParser.parseMessageType(
      "message schema { optional int64 id; optional int64 elapsed; }")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new Path(file), conf))
      .withConf(conf)
      .withExtraMetaData(
        java.util.Collections.singletonMap("pandas", pandasMeta))
      .build()
    try {
      val g1 = new SimpleGroup(schema)
      g1.append("id", 1L); g1.append("elapsed", 93600000000000L) // 1d 2h
      val g2 = new SimpleGroup(schema)
      g2.append("id", 2L); g2.append("elapsed", 90000000000L) // 90 s
      w.write(g1); w.write(g2)
    } finally w.close()
    dir
  }

  test("partitioned pandas dataset (key=val subdirs) is still detected") {
    // pandas to_parquet(partition_cols=[...]) nests parts under
    // key=val directories — a top-level-only listing would return Nil
    // and silently skip the timedelta conversion (raw INT64 nanos
    // leaking through as BIGINT), the exact wrong round-trip this shim
    // prevents; the recursive part search must find the nested footer
    val dir = writePandasStyle(sub = "date=2020-01-01")
    assert(PandasParquet.timedeltaColumns(spark, dir) ===
      Seq("elapsed" -> 1e9))
  }

  test("pandas timedelta columns are detected from footer metadata") {
    val dir = writePandasStyle()
    assert(PandasParquet.timedeltaColumns(spark, dir) ===
      Seq("elapsed" -> 1e9))
    // plain Spark-written parquet: no pandas metadata, no conversions
    import spark.implicits._
    val plain = Files.createTempDirectory("graft_pd2").toString + "/t"
    Seq((1L, 2L)).toDF("id", "elapsed").write.parquet(plain)
    assert(PandasParquet.timedeltaColumns(spark, plain).isEmpty)
  }

  test("read converts timedelta to float seconds like total_seconds()") {
    val df = PandasParquet.read(spark, writePandasStyle())
    val got = df.orderBy("id").collect()
    assert(got(0).getDouble(1) === 93600.0)
    assert(got(1).getDouble(1) === 90.0)
    // and the type mapper now sees a float → NUMERIC, not INT
    val types = SqlTypeMapper.inferColumnTypes(df).toMap
    assert(types("elapsed") === SqlNumeric(18, 2))
  }

  test("metadata parser handles units and ignores foreign json") {
    val cols = PandasParquet.parsePandasColumns(
      """{"columns":[{"name":"a","numpy_type":"timedelta64[us]"},
        |{"name":"b","numpy_type":"float64"}]}""".stripMargin)
    assert(cols === Seq("a" -> 1e6))
    assert(PandasParquet.parsePandasColumns("{}").isEmpty)
    assert(PandasParquet.parsePandasColumns("not json").isEmpty)
  }
}
