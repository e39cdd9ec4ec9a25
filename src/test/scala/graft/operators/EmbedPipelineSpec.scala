package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q78 — the composed embeddings pipeline (seed → screen → append →
  * revalidate → dedup → soft-delete serving) plus the [[IndexStore
  * .queryIvfPq]] exclusion semantics it introduced. The composition's
  * value is interface-drift detection, so the spec exercises the REAL
  * chained artifacts (scratch corpus + index + lists), not mocks. */
class EmbedPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def deleteDir(path: String): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("q78 composes screen→append→dedup→serve: full-k answers whose " +
    "overlap with the all-exact twin clears the gate floor, and a " +
    "re-run is a no-op serving the identical answer") {
    val root = EmbedPipeline.pipeDirFor(spark, sfDir)
    deleteDir(root)
    try {
      val r1 = EmbedPipeline.q78EmbedPipeline(spark, sfDir).collect()
      assert(r1.nonEmpty)
      // every query serves exactly k ranked rows (the fixture has far
      // more survivors than k) with contiguous ranks from 1
      r1.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        assert(rows.map(_.getInt(2)).sorted.toSeq ===
          (1 to Similarity.k))
      }
      val twin = pairs(EmbedPipeline.q78ExactTwin(spark, sfDir))
      val got = r1.map(r => (r.getLong(0), r.getLong(1))).toSet
      val overlap = (twin intersect got).size.toDouble / twin.size
      assert(overlap >= graft.Verify.pipelineFloor,
        s"composed overlap $overlap below gate floor " +
          s"${graft.Verify.pipelineFloor}")
      // replay: the standing corpus is unchanged (the anti-join admits
      // nothing) and the served answer is identical row-for-row
      val table = s"$root/c/embeddings.parquet"
      val n1 = spark.read.parquet(table).count()
      val r2 = EmbedPipeline.q78EmbedPipeline(spark, sfDir).collect()
      assert(spark.read.parquet(table).count() === n1)
      assert(r2.toSeq === r1.toSeq)
    } finally deleteDir(root)
  }

  test("a seed-identity mismatch reseeds the scratch pipeline instead " +
    "of serving a corpus the source no longer matches") {
    val root = EmbedPipeline.pipeDirFor(spark, sfDir)
    deleteDir(root)
    try {
      val r1 = EmbedPipeline.q78EmbedPipeline(spark, sfDir).collect()
      val table = s"$root/c/embeddings.parquet"
      val n1 = spark.read.parquet(table).count()
      // forge divergence: poison the standing corpus AND invalidate
      // the seed marker (the state a source rewrite leaves behind —
      // marker content no longer matches the source identity)
      Seq((999999999L, Array.fill(64)(0.25f), "zz"))
        .toDF("vec_id", "embedding", "label")
        .write.mode("append").parquet(table)
      val (fs, seedP) = graft.Scratch.fs(spark, s"$root/_seed")
      val out = fs.create(seedP, true)
      try out.write("graftembpipe|1|0|0".getBytes("UTF-8"))
      finally out.close()
      val r2 = EmbedPipeline.q78EmbedPipeline(spark, sfDir).collect()
      // reseeded: the poison row is gone, the corpus is back to its
      // deterministic composed size, and the answer is unchanged
      assert(spark.read.parquet(table).count() === n1)
      assert(spark.read.parquet(table)
        .filter(col("vec_id") === 999999999L).count() === 0L)
      assert(r2.toSeq === r1.toSeq)
    } finally deleteDir(root)
  }

  test("queryIvfPq exclude is soft-delete serving: the excluded id " +
    "never surfaces, every query still serves full k, and no " +
    "surviving neighbor is lost") {
    deleteDir(IndexStore.dirFor(spark, sfDir))
    try {
      val info = IndexStore.ensure(spark, sfDir)
      val base = IndexStore.queryIvfPq(spark, sfDir, info)
      val baseRows = base.collect()
      // excluded victim: a served neighbor (so the exclusion is
      // observable), chosen deterministically
      val victim = baseRows.map(_.getLong(1)).min
      val excluded = IndexStore.queryIvfPq(spark, sfDir, info,
        exclude = Some(Seq(victim).toDF("vec_id"))).collect()
      assert(!excluded.exists(_.getLong(1) == victim))
      excluded.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        assert(rows.length === Similarity.k)
      }
      // the anti-join removes ONLY the victim from the candidate
      // stream: every previously-served surviving neighbor is still
      // served (rank-k recomputes among the rest, it doesn't truncate)
      val before = baseRows.filter(_.getLong(1) != victim)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val after = excluded.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before.subsetOf(after))
    } finally deleteDir(IndexStore.dirFor(spark, sfDir))
  }
}
