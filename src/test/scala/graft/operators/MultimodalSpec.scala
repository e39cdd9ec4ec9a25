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
