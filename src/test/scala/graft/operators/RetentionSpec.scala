package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** [[Retention.forget]]/[[Retention.forgetWhere]] — the user-facing
  * multi-store forget: predicate kill sets removed from both corpora
  * and excluded from serving, replay convergence, the deferred-fold
  * default vs foldNow, and the loud index-less refusal. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def deleteDir(path: String): Unit = {
    val (fs, p) = graft.Scratch.fs(spark, path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("ret_corpus").toString
    Tables.load(spark, sfDir, "documents")
      .write.parquet(s"$dir/documents.parquet")
    Tables.load(spark, sfDir, "embeddings")
      .write.parquet(s"$dir/embeddings.parquet")
    Seq(LexIndex.dirFor(spark, dir), IndexStore.dirFor(spark, dir))
      .foreach(deleteDir)
    dir
  }

  test("forgetWhere removes the predicate rows from both corpora and " +
    "both stores' serving, a replay no-ops, and foldNow on the replay " +
    "folds the pending tombstones physically") {
    val dir = freshCorpus()
    LexIndex.ensure(spark, dir)
    IndexStore.ensure(spark, dir)
    val docPred = col("doc_id") % 13 === 2
    val vecPred = col("vec_id") % 13 === 2
    val killDocs = Tables.load(spark, dir, "documents")
      .filter(docPred).select("doc_id").as[Long].collect().toSet
    val killVecs = Tables.load(spark, dir, "embeddings")
      .filter(vecPred).select("vec_id").as[Long].collect().toSet
    assert(killDocs.nonEmpty && killVecs.nonEmpty)

    val st = Retention.forgetWhere(spark, dir,
      Some(docPred), Some(vecPred))
    assert(st.docsTombstoned == killDocs.size &&
      st.docsRemovedFromCorpus == killDocs.size)
    assert(st.vecsTombstoned == killVecs.size &&
      st.vecsRemovedFromCorpus == killVecs.size)
    assert(!st.foldedLex && !st.foldedAnn)
    // corpora rewritten
    assert(Tables.load(spark, dir, "documents").filter(docPred).isEmpty)
    assert(Tables.load(spark, dir, "embeddings").filter(vecPred).isEmpty)
    // serving excludes from this instant (pre-fold: via tombstones)
    val lexInfo = LexIndex.ensure(spark, dir)
    assert(!lexInfo.builtNow && lexInfo.n == 500 - killDocs.size)
    val annInfo = IndexStore.ensure(spark, dir)
    assert(!annInfo.builtNow && annInfo.n == 500 - killVecs.size)
    val served = IndexStore.queryIvfPq(spark, dir, annInfo)
    assert(served
      .filter(col("neighbor_id").isin(killVecs.toSeq: _*)).isEmpty,
      "a forgotten vec_id was served as a neighbor")

    // replay: predicate over the rewritten corpus is empty — no-op
    val st2 = Retention.forgetWhere(spark, dir,
      Some(docPred), Some(vecPred))
    assert(st2.docsTombstoned == 0 && st2.vecsTombstoned == 0 &&
      st2.docsRemovedFromCorpus == 0 && st2.vecsRemovedFromCorpus == 0)

    // foldNow on a replay folds the PENDING tombstones from the first
    // call (the amortized-compaction shape: many forgets, one fold)
    val st3 = Retention.forgetWhere(spark, dir,
      Some(docPred), Some(vecPred), foldNow = true)
    assert(st3.foldedLex && st3.foldedAnn)
    assert(LexIndex.tombstoneFrame(spark,
      LexIndex.dirFor(spark, dir)).isEmpty)
    assert(IndexStore.tombstoneFrame(spark,
      IndexStore.dirFor(spark, dir)).isEmpty)
    // folded serving still excludes (now physically) and validates
    // with no rebuild
    val annInfo2 = IndexStore.ensure(spark, dir)
    assert(!annInfo2.builtNow && annInfo2.n == 500 - killVecs.size)
  }

  test("forget on an index-less corpus refuses loudly instead of " +
    "deleting only the side that has an index") {
    val dir = freshCorpus()
    // no ensure — no stores exist
    intercept[IllegalStateException] {
      Retention.forget(spark, dir,
        docIds = Some(Seq(1L).toDF("doc_id")))
    }
    intercept[IllegalStateException] {
      Retention.forget(spark, dir,
        vecIds = Some(Seq(1L).toDF("vec_id")))
    }
    // and a no-op forget (nothing to forget) is legal without stores
    val st = Retention.forget(spark, dir)
    assert(st == Retention.ForgetStats(0, 0, 0, 0, false, false))
  }
}
