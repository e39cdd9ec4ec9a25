package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DeletePipeline, IndexStore, LexIndex}
import graft.sources.Tables

/** Correction-lifecycle cost probe (the q81/q82 machinery at scale):
  * time every stage of erase → fold → corrected re-admission through
  * the REAL public interfaces on a scaled corpus, against the only
  * alternative a store without the lifecycle has — a full rebuild of
  * both indexes on the final corpus. The q79/q80 DELETE_SCALE probe
  * already priced deletion; this prices the full rectification loop,
  * whose point is that its cost is (delete + fold + batch-sized
  * re-admit), never O(rebuild) — and that the final state validates
  * with NO rebuild (the xor fingerprint composes across the whole
  * sequence).
  *
  *   sbt "runMain graft.CorrectionProbe /tmp/sfbig [runs]"
  *
  * The corpus dir must carry documents.parquet + embeddings.parquet
  * (the sfbig generator's layout). Scratch state is wiped per run, so
  * every reading is the full pipeline with no vtoken shortcuts. */
object CorrectionProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CorrectionProbe <corpusDir> [runs]")
    val src = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val spark = GraftSession.local("graft-corrprobe")
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, src)

    def deleteDir(path: String): Unit = {
      val (fs, p) = Scratch.fs(spark, path)
      if (fs.exists(p)) fs.delete(p, true)
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    try (1 to runs).foreach { run =>
      // fresh scratch corpus per run (ensureCorrected's own seed
      // discipline would reuse state across runs — this probe wants
      // cold numbers per stage, so it drives the stages itself).
      // try/finally below: a failed stage (e.g. the validate REQUIRE)
      // must not strand a full corpus copy + two index dirs on disk
      val root = java.nio.file.Files
        .createTempDirectory("corrprobe").toString
      val corpus = s"$root/c"
      val lexDir = LexIndex.dirFor(spark, corpus)
      val annDir = IndexStore.dirFor(spark, corpus)
      try {
      Tables.load(spark, src, "documents")
        .write.mode(SaveMode.ErrorIfExists)
        .parquet(s"$corpus/documents.parquet")
      Tables.load(spark, src, "embeddings")
        .write.mode(SaveMode.ErrorIfExists)
        .parquet(s"$corpus/embeddings.parquet")
      Seq(lexDir, annDir).foreach(deleteDir)

      val nDocs = Tables.load(spark, corpus, "documents").count()
      val nVecs = Tables.load(spark, corpus, "embeddings").count()

      val buildLex = timed(LexIndex.ensure(spark, corpus))
      val buildAnn = timed(IndexStore.ensure(spark, corpus))

      def killDocs = Tables.load(spark, corpus, "documents")
        .filter(DeletePipeline.kill(col("doc_id"))).select(col("doc_id"))
      def killVecs = Tables.load(spark, corpus, "embeddings")
        .filter(DeletePipeline.kill(col("vec_id"))).select(col("vec_id"))
      val kDocs = killDocs.count()
      val kVecs = killVecs.count()

      val eraseLex = timed(LexIndex.deleteDocs(spark, corpus, killDocs))
      val foldLex = timed(LexIndex.compact(spark, corpus))
      val eraseAnn = timed(IndexStore.deleteBatch(spark, corpus, killVecs))
      val foldAnn = timed(
        graft.sources.Maintenance.compactAnnIndex(spark, annDir))

      // corrected re-admission from the SOURCE tables (q81/q82 form)
      val corrD = Tables.load(spark, src, "documents")
        .filter(DeletePipeline.kill(col("doc_id")))
        .select(col("doc_id"),
          concat(lit(DeletePipeline.correctionPrefix), col("text"))
            .as("text"))
      val corrV = Tables.load(spark, src, "embeddings")
        .filter(DeletePipeline.kill(col("vec_id")))
        .select(col("vec_id"),
          expr("transform(embedding, x -> -x)").as("embedding"))
      val readd = timed {
        corrD.write.mode(SaveMode.Append)
          .parquet(s"$corpus/documents.parquet")
        LexIndex.appendBatch(spark, corpus, corrD)
        corrV.write.mode(SaveMode.Append)
          .parquet(s"$corpus/embeddings.parquet")
        IndexStore.appendBatch(spark, annDir, corrV)
        ()
      }
      // the lifecycle's closing claim: the final state validates with
      // NO rebuild (stateless, so the vtoken path is exercised too)
      val validate = timed {
        val li = LexIndex.ensure(spark, corpus)
        val ai = IndexStore.ensure(spark, corpus)
        require(!li.builtNow && !ai.builtNow,
          "post-correction ensure rebuilt — the fingerprint fold " +
            "across erase/fold/re-add is broken at this scale")
      }
      // the alternative a lifecycle-less store pays: rebuild both
      // indexes from scratch on the final corpus
      Seq(lexDir, annDir).foreach(deleteDir)
      val rebuild = timed {
        LexIndex.ensure(spark, corpus)
        IndexStore.ensure(spark, corpus)
        ()
      }
      val lifecycle =
        eraseLex + foldLex + eraseAnn + foldAnn + readd + validate
      println(s"""{"probe":"correction","src":${Json.str(src)},""" +
        s""""run":$run,"n_docs":$nDocs,"n_vecs":$nVecs,""" +
        s""""kill_docs":$kDocs,"kill_vecs":$kVecs,""" +
        s""""build_lex_sec":${Json.f3(buildLex)},""" +
        s""""build_ann_sec":${Json.f3(buildAnn)},""" +
        s""""erase_lex_sec":${Json.f3(eraseLex)},""" +
        s""""fold_lex_sec":${Json.f3(foldLex)},""" +
        s""""erase_ann_sec":${Json.f3(eraseAnn)},""" +
        s""""fold_ann_sec":${Json.f3(foldAnn)},""" +
        s""""readd_sec":${Json.f3(readd)},""" +
        s""""validate_sec":${Json.f3(validate)},""" +
        s""""lifecycle_sec":${Json.f3(lifecycle)},""" +
        s""""rebuild_sec":${Json.f3(rebuild)}}""")
      } finally {
        deleteDir(root)
        Seq(lexDir, annDir).foreach(deleteDir)
      }
    }
    finally spark.stop()
  }
}
