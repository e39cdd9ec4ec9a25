package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.checks.Validations.Method

class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("partitioned sink writes hive layout and scans prune partitions") {
    val base = Files.createTempDirectory("graft_part").toString
    val orders = Tables.load(spark, sfDir, "orders")
    ParquetSink.write(orders,
      ParquetSink.Config(base, "orders", "s", Method.Create,
        partitionBy = Seq("o_orderstatus")))
    val path = s"$base/s/orders.parquet"
    // hive-style dirs exist
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("o_orderstatus="))
    assert(dirs.length >= 2)
    // a status filter becomes a PartitionFilter, not a data filter
    val q = spark.read.parquet(path).filter(col("o_orderstatus") === "O")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("o_orderstatus"), plan)
    assert(q.count() ===
      orders.filter(col("o_orderstatus") === "O").count())
  }

  test("compaction collapses small files, preserves data exactly") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
    df.repartition(16).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(col("id")), sum(col("v")), count(lit(1)))
      .head().toSeq
    val (before, after) = Maintenance.compact(spark, dir, 600)
    assert(before === 16)
    assert(after === 2)
    val checksumAfter = spark.read.parquet(dir)
      .agg(sum(col("id")), sum(col("v")), count(lit(1)))
      .head().toSeq
    assert(checksumAfter === checksumBefore)
  }

  test("compaction preserves a hive-partitioned layout (pruning " +
    "survives)") {
    // compacting a partitioned table flat would silently demote the
    // key=val directories to data columns and permanently lose
    // planning-time pruning — the layout must round-trip
    val dir = Files.createTempDirectory("graft_compact_p").toString + "/t"
    val df = spark.range(400).select(col("id"),
      (col("id") % 3).cast("int").as("part"))
    df.repartition(8).write.partitionBy("part").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq
    val (nBefore, nAfter) = Maintenance.compact(spark, dir, 1000)
    assert(nBefore > 3 && nAfter <= 3, s"$nBefore -> $nAfter")
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("part="))
    assert(dirs.sorted.toSeq === Seq("part=0", "part=1", "part=2"))
    val q = spark.read.parquet(dir).filter(col("part") === 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("part"),
      plan)
    assert(spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq === before)
  }

  test("compaction honors targetRowsPerFile WITHIN an oversized hive " +
    "partition, one file for small ones") {
    // a skewed layout: one hot partition (900 rows) next to a small
    // one (50). The old behavior rewrote the hot partition as ONE
    // oversized file regardless of the caller's row quota; it must
    // subdivide to ~ceil(900/300)=3 files while the small partition
    // still compacts to exactly one.
    val dir = Files.createTempDirectory("graft_compact_sk").toString + "/t"
    val df = spark.range(950).select(col("id"),
      when(col("id") < 900, 0).otherwise(1).cast("int").as("part"))
    df.repartition(10).write.partitionBy("part").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq
    Maintenance.compact(spark, dir, 300)
    def filesIn(p: Int): Int =
      // current generation (compact commits retained gens)
      new java.io.File(
          s"${Generations.resolve(spark, dir)}/part=$p").listFiles()
        .count(_.getName.endsWith(".parquet"))
    // salting is approximate (hash collisions can merge two groups in
    // one task) — ≥ 2 proves the partition was subdivided at all,
    // ≤ 4 that it was not shattered
    assert(filesIn(0) >= 2 && filesIn(0) <= 4, s"hot: ${filesIn(0)}")
    assert(filesIn(1) === 1)
    // layout + content still round-trip
    val q = spark.read.parquet(dir).filter(col("part") === 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("part"),
      plan)
    assert(spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq === before)
  }

  test("compaction survives a partitioned layout with zero rows " +
    "(foreign-writer shape: partition dirs, empty files)") {
    // this repo's writers never produce it, but a foreign writer can:
    // hive dirs present, every data file zero-row. The per-partition
    // quota aggregate is then EMPTY, sum() is NULL, and an unguarded
    // getLong NPE'd (ADVICE r12) — the rewrite must degrade, not crash
    val dir = Files.createTempDirectory("graft_compact_z").toString + "/t"
    val df = spark.range(10).select(col("id"),
      lit(0).cast("int").as("part"))
    df.coalesce(1).write.partitionBy("part").parquet(dir)
    // swap the partition's data file for a zero-row one, same schema
    val empty = Files.createTempDirectory("graft_compact_z_e").toString + "/e"
    df.filter(lit(false)).drop("part").repartition(1).write.parquet(empty)
    assert(spark.read.parquet(empty).count() === 0L, "empty src readable")
    val pdir = new java.io.File(s"$dir/part=0")
    pdir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(_.delete())
    val srcFiles = new java.io.File(empty).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(srcFiles.nonEmpty,
      "fixture setup: expected a footer-only parquet file")
    val src = srcFiles.head
    Files.copy(src.toPath,
      new java.io.File(pdir, src.getName).toPath)
    assert(spark.read.parquet(dir).count() === 0L)
    Maintenance.compact(spark, dir, 1000) // must not throw
    assert(spark.read.parquet(dir).count() === 0L)
  }

  test("compactVecLists skips a zero-row lists table instead of " +
    "swapping in an unreadable shell (ADVICE r13)") {
    // foreign-writer shape again: a readable lists/ dir whose every
    // file is zero-row. partitionBy over zero rows writes NO part
    // files — an unguarded rewrite would swap in a footer-less dir
    // that every later read throws on.
    val vlDir = Files.createTempDirectory("graft_veclists_z").toString
    val dir = s"$vlDir/lists"
    val empty = spark.range(0).select(col("id").as("vec_id"),
      lit(1.0).as("nrm"),
      org.apache.spark.sql.functions.array(lit(0.0)).as("v"),
      lit(0L).as("cell"))
    // cell=0 partition dir with a zero-row (footer-bearing) file
    empty.withColumn("cell", lit(0L)).coalesce(1)
      .write.partitionBy("cell").parquet(dir)
    val src = empty.drop("cell")
    val ef = Files.createTempDirectory("graft_veclists_z_e").toString + "/e"
    src.coalesce(1).write.parquet(ef)
    val f = new java.io.File(ef).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val pdir = new java.io.File(s"$dir/cell=0")
    pdir.mkdirs()
    Files.copy(f.toPath, new java.io.File(pdir, f.getName).toPath)
    assert(spark.read.parquet(dir).count() === 0L)
    val (b, a) = Maintenance.compactVecLists(spark, vlDir)
    assert(b === a, "zero-row table must be skipped, not rewritten")
    assert(spark.read.parquet(dir).count() === 0L,
      "lists dir must stay readable after the skip")
  }

  test("compaction refuses a bucketed table directory (bucket " +
    "membership is name-encoded in the part files)") {
    val base = Files.createTempDirectory("graft_compact_bkt").toString
    val tbl = "compact_refuse_bkt"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.range(100).select(col("id"), (col("id") % 5).as("k"))
      .repartition(4, col("k"))
      .write.mode("overwrite").option("path", s"$base/t")
      .bucketBy(4, "k").saveAsTable(tbl)
    try {
      val e = intercept[IllegalArgumentException] {
        Maintenance.compact(spark, s"$base/t", 50)
      }
      assert(e.getMessage.contains("bucket"))
      // the refusal left the table untouched and scannable
      assert(spark.table(tbl).count() === 100)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("compaction round-trips a NULL partition value (the quota " +
    "join-back must be null-safe, not equi)") {
    // hive stores null partition values as __HIVE_DEFAULT_PARTITION__;
    // a plain equi-join of the per-partition quotas back onto the rows
    // never matches null = null, and those rows would silently vanish
    // from the compacted table
    val dir = Files.createTempDirectory("graft_compact_null").toString + "/t"
    val df = spark.range(300).select(col("id"),
      when(col("id") % 3 === 0, lit(null).cast("int"))
        .otherwise((col("id") % 3).cast("int")).as("part"))
    df.repartition(6).write.partitionBy("part").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq
    Maintenance.compact(spark, dir, 1000)
    assert(spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq === before)
    // the null partition's rows specifically survived
    assert(spark.read.parquet(dir).filter(col("part").isNull).count()
      === 100)
  }

  test("compaction preserves a MULTI-LEVEL hive layout (nested " +
    "key=val chain round-trips)") {
    // partitionCols walks the nested key=val directory chain — a
    // two-level layout (e.g. date/tenant) must round-trip both levels
    // in order, not flatten to the outermost one
    val dir = Files.createTempDirectory("graft_compact_p2").toString + "/t"
    val df = spark.range(600).select(col("id"),
      (col("id") % 2).cast("int").as("p1"),
      (col("id") % 3).cast("int").as("p2"))
    df.repartition(8).write.partitionBy("p1", "p2").parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq
    val (nBefore, nAfter) = Maintenance.compact(spark, dir, 1000)
    assert(nBefore > 6 && nAfter <= 6, s"$nBefore -> $nAfter")
    // both levels survive, in their original nesting order (in the
    // committed generation — compact retains the old one until TTL)
    val cur = Generations.resolve(spark, dir)
    val l1 = new java.io.File(cur).listFiles().map(_.getName)
      .filter(_.startsWith("p1=")).sorted
    assert(l1.toSeq === Seq("p1=0", "p1=1"))
    val l2 = new java.io.File(s"$cur/p1=0").listFiles().map(_.getName)
      .filter(_.startsWith("p2=")).sorted
    assert(l2.toSeq === Seq("p2=0", "p2=1", "p2=2"))
    val q = spark.read.parquet(dir)
      .filter(col("p1") === 1 && col("p2") === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("p2"), plan)
    assert(spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1))).head().toSeq === before)
  }

  test("ingest-index compaction drops orphans and replay duplicates " +
    "and rebuilds lost rows, restoring corpus/index lockstep") {
    import graft.operators.Dedup
    val corpusDir = Files.createTempDirectory("graft_idx_compact")
      .toString + "/corpus"
    // committed corpus: docs 1..3
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "colorless green ideas sleep furiously every single night", "en"),
      (3L, "entirely different words about seven distinct topics now", "en"))
      .toDF("doc_id", "text", "lang")
    corpus.write.parquet(corpusDir)
    // every drift class at once: doc 2's rows appended TWICE
    // (crash-replay re-append), an orphan doc 99 (admitted by a
    // crashed batch that never reached the corpus write), and doc 3's
    // rows LOST entirely (a concurrent append deleted with a
    // swapped-away dir)
    val sh = Dedup.shingleIndex(corpus.filter(col("doc_id") =!= 3L))
    val orphan = Dedup.shingleIndex(Seq(
      (99L, "ghost rows from a crashed batch that never committed", "en"))
      .toDF("doc_id", "text", "lang"))
    val dup = sh.filter(col("doc_id") === 2L)
    sh.union(dup).union(orphan).write.parquet(corpusDir + "__sh")
    Dedup.minhashBands(sh).union(Dedup.minhashBands(dup))
      .union(Dedup.minhashBands(orphan))
      .write.parquet(corpusDir + "__bands")
    val (shDropped, bandsDropped) =
      Maintenance.compactIngestIndexes(spark, corpusDir)
    assert(shDropped === 1L)      // dup + orphan dropped, doc 3 rebuilt
    assert(bandsDropped === 16L)  // 32 debris bands out, 16 rebuilt in
    val shIds = spark.read
      .parquet(Generations.resolve(spark, corpusDir + "__sh"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(shIds === Seq(1L, 2L, 3L))
    val bandCounts = spark.read
      .parquet(Generations.resolve(spark, corpusDir + "__bands"))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(bandCounts === Map(1L -> 16L, 2L -> 16L, 3L -> 16L))
    // the rebuilt rows are byte-identical to a from-scratch index:
    // lockstep means a future near-dup of doc 3 is screened again
    val rebuilt = spark.read
      .parquet(Generations.resolve(spark, corpusDir + "__sh"))
      .filter(col("doc_id") === 3L).select("sh")
      .as[Seq[String]].head()
    val expected = Dedup.shingleIndex(corpus.filter(col("doc_id") === 3L))
      .select("sh").as[Seq[String]].head()
    assert(rebuilt === expected)
  }

  test("approx_count_distinct (HLL++) lands within 5% of exact") {
    val ev = Tables.events(spark, sfDir)
    val (approx, exact) = ev.agg(
      approx_count_distinct(col("user_id")),
      countDistinct(col("user_id")))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
