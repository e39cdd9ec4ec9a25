package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them, and per-record
  * decode / feature-extraction runs as a partition-batched pipeline.
  *
  * The actual codec step is a clearly-marked STUB (no image/audio
  * libraries in this environment) — a deterministic fake derived from
  * the payload bytes. Everything Spark-side is real and load-bearing:
  * the schema shape, the binary column handling, the mapPartitions
  * batching (one decoder init per partition, not per row — exactly how
  * a JNI/FFmpeg/JPEG decoder must be amortized on a real cluster), and
  * the pushdown-friendly metadata layout (a scan that only needs
  * `meta.*` never touches the payload bytes thanks to parquet column
  * pruning).
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,
      payload: Array[Byte])

  /** Extracted features (the decoder output schema). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      content_hash: String)

  /** STUB decoder: deterministic fake dimensions from the byte length +
    * a real content hash. A production build swaps `decodeOne` for a
    * real codec; the partition-batched driver loop stays unchanged. */
  private def decodeOne(md: java.security.MessageDigest)(
      r: MediaRecord): MediaFeatures = {
    md.reset()
    val hash = md.digest(r.payload).take(8).map("%02x".format(_)).mkString
    val n = r.payload.length
    MediaFeatures(r.media_id, r.kind, n, n % 640, (n * 3) % 480, hash)
  }

  /** Partition-batched decode: one expensive "decoder" (here the digest
    * instance) per partition, streamed over the iterator — constant
    * memory, no per-row init cost, no driver collect. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decodeOne(md))
    }
  }

  /** Resized media (STUB codec, real plumbing): new payload is a
    * deterministic slice, dimensions scaled — schema mirrors what a real
    * image `resize(w, h)` produces. */
  final case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, payload: Array[Byte])

  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        // STUB: a real codec would decode + scale; the fake keeps a
        // deterministic prefix proportional to the requested area.
        val len = math.min(r.payload.length, math.max(1, (w * h) / 64))
        ResizedMedia(r.media_id, r.kind, w, h, r.payload.take(len))
      }
    }
  }

  /** Frame sampling (STUB codec, real plumbing): every k-th "frame" of
    * the payload, one output row per sampled frame — the row-exploding
    * shape a video pipeline produces (flatMap, constant memory). */
  final case class MediaFrame(media_id: Long, frame_no: Int,
      frame: Array[Byte])

  def frameSampleStub(media: Dataset[MediaRecord], frameBytes: Int,
      every: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, i) if i % every == 0 => MediaFrame(r.media_id, i, bytes)
      }
    }
  }

  /** Documents rendered as a media table (payload = UTF-8 bytes) — the
    * testdata has no binary column, so the text bytes stand in; the
    * plumbing downstream is payload-agnostic. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("text/plain").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** q40: metadata extraction over the binary payload column, expressed
    * in pure column functions (the oracle-checkable subset of the stub
    * decode — same fake-dimension formulas, first 16 hex of md5). */
  def q40MediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        (length(encode(col("text"), "UTF-8")) % 640).as("width"),
        ((length(encode(col("text"), "UTF-8")) * 3) % 480).as("height"),
        substring(md5(col("text")), 1, 16).as("content_hash"))
      .orderBy(col("media_id"))
}
