package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("decodeFeatures: partition-batched decode is deterministic and " +
    "schema-stable") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "n_bytes", "width", "height", "content_hash"))
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(a.toSeq === b.toSeq) // deterministic across runs
    assert(a.length === media.count())
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width === f.n_bytes % 640)
      assert(f.content_hash.length === 16)
    }
  }

  test("resize stub keeps ids and scales payload deterministically") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val resized = Multimodal.resizeStub(media, 64, 64).collect()
    assert(resized.length === media.count())
    resized.foreach { r =>
      assert(r.width === 64 && r.height === 64)
      assert(r.payload.length <= 64) // (64*64)/64 cap
      assert(r.payload.nonEmpty)
    }
  }

  test("frame sampling explodes every k-th frame with constant memory shape") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.frameSampleStub(media, frameBytes = 16, every = 2)
      .collect()
    // every doc yields ceil(len/16) frames, indices 0,2,4,...
    assert(frames.forall(_.frame_no % 2 === 0))
    assert(frames.forall(f => f.frame.length <= 16 && f.frame.nonEmpty))
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.size === media.count())
  }

  test("mapPartitions decode matches the column-function q40 metadata") {
    val feats = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(spark, sfDir))
      .select("media_id", "n_bytes", "width", "height", "content_hash")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    val q40 = Multimodal.q40MediaMeta(spark, sfDir)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    // ASCII-only fixture text → md5(bytes) == md5(utf8 string)
    assert(feats.toSeq === q40.toSeq)
  }
}
