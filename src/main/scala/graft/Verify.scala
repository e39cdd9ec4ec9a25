package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — extra names restrict the
    // dump to those queries (targeted re-gating after a focused change;
    // pair with scripts/check_oracles.py --only). The driver's 2-arg
    // call is unchanged and dumps everything.
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    // a typo'd name would dump nothing, exit 0, and let check_oracles
    // pass against a STALE dump from a prior run — fail loudly instead
    val unknown = only.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query names: ${unknown.mkString(", ")}")
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    // pre-delete each selected dump: a query that THROWS must surface
    // as a missing dump (FAIL) downstream, not as its stale
    // previous-run parquet silently passing the compare
    selected.keys.foreach { name =>
      org.apache.hadoop.fs.FileUtil
        .fullyDelete(new java.io.File(s"$outDir/$name"))
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
