package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them, and per-record
  * decode / feature-extraction runs as a partition-batched pipeline.
  *
  * IMAGE decode and resize are REAL — JDK `javax.imageio` (PNG, JPEG,
  * GIF, BMP) needs no external dependency. AUDIO header metadata
  * (sample rate, channel count) is REAL for the container formats the
  * JDK ships parsers for (WAV/AIFF/AU via `javax.sound.sampled`) AND
  * for MP3/FLAC/OGG-Opus/OGG-Vorbis, parsed directly from their public
  * bitstream layouts ([[flacStreamInfo]], [[mp3FrameHeader]],
  * [[oggAudioHeader]] — no codec needed for header fields).
  * Compressed-audio PCM decode and video remain
  * clearly-marked stubs (the JDK ships no codecs for them); their
  * Spark-side plumbing — schema shape, binary column handling,
  * mapPartitions batching (one decoder init per partition, not per
  * row — exactly how a JNI/FFmpeg decoder must be amortized on a real
  * cluster), and the pushdown-friendly metadata layout (a scan that
  * only needs metadata never touches the payload bytes thanks to
  * parquet column pruning) — is identical to the image path and tested
  * through it.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,
      payload: Array[Byte])

  /** Extracted features (the decoder output schema). `width`/`height`
    * carry image dimensions, `sample_rate`/`channels` audio header
    * fields; -1 marks not-applicable-for-kind or undecodable. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      sample_rate: Int,
      channels: Int,
      content_hash: String)

  // null-safe: a generic media source can carry a null kind, and the
  // module contract is mark-don't-throw — an unknown kind routes to the
  // stub branch, never to an NPE that kills the stage
  private def isImage(kind: String): Boolean =
    kind != null && kind.startsWith("image/")
  private def isAudio(kind: String): Boolean =
    kind != null && kind.startsWith("audio/")

  /** Real audio header parse: (sampleRate, channels). Container formats
    * the JDK ships parsers for (WAV/AIFF/AU) go through
    * `javax.sound.sampled`; FLAC and MP3 — which the JDK has no parser
    * for — are parsed directly from their public bitstream layouts
    * ([[flacStreamInfo]], [[mp3FrameHeader]]). The PAYLOAD decides (magic
    * bytes / frame sync), not the declared kind — a mislabeled corpus
    * row still parses. None for corrupt/unknown — marked, never thrown. */
  private def decodeAudio(payload: Array[Byte]): Option[(Int, Int)] =
    (try {
      val fmt = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new ByteArrayInputStream(payload)).getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels))
    } catch { case scala.util.control.NonFatal(_) => None })
      .orElse(flacStreamInfo(payload))
      .orElse(oggAudioHeader(payload))
      .orElse(mp3FrameHeader(payload))

  private def u(b: Byte): Int = b & 0xff

  private def le32(p: Array[Byte], i: Int): Int =
    u(p(i)) | (u(p(i + 1)) << 8) | (u(p(i + 2)) << 16) | (u(p(i + 3)) << 24)

  /** First packet of an OGG stream's first page (RFC 3533 §6): "OggS"
    * capture pattern, stream_structure_version 0, the BOS
    * (beginning-of-stream) flag set, then the segment lacing table.
    * The identification headers both Opus and Vorbis mandate as the
    * whole first packet are far under one lacing segment, so a first
    * packet that does not terminate inside this page (no lacing value
    * < 255) is not an id header — rejected, like every truncation.
    * Evidence discipline: 4 magic bytes + 2 pinned fields here, plus
    * the codec's own 7-8 magic bytes inside the packet — a random
    * payload cannot pseudo-sync (cf. the MP3 two-frame rule, needed
    * there because an MP3 "magic" is only 11 loose bits). */
  private[operators] def oggFirstPacket(p: Array[Byte]): Option[Array[Byte]] = {
    if (p.length < 28) return None
    if (!(p(0) == 'O' && p(1) == 'g' && p(2) == 'g' && p(3) == 'S')) return None
    if (u(p(4)) != 0) return None           // stream_structure_version
    if ((u(p(5)) & 0x02) == 0) return None  // first page must be BOS
    val nSegs = u(p(26))
    if (nSegs < 1 || p.length < 27 + nSegs) return None
    var len = 0
    var k = 0
    var terminated = false
    while (k < nSegs && !terminated) {
      val v = u(p(27 + k))
      len += v
      if (v < 255) terminated = true
      k += 1
    }
    if (!terminated) return None
    val start = 27 + nSegs
    if (p.length < start + len) return None
    Some(java.util.Arrays.copyOfRange(p, start, start + len))
  }

  /** Opus identification header (RFC 7845 §5.1): "OpusHead", version
    * with major nibble 0, channel count ≥ 1, 16-bit pre-skip, 32-bit
    * LE input sample rate. Opus always DECODES at 48 kHz; the header
    * field records the original input rate and is allowed to be 0
    * (unknown) — report it when present, else the 48 kHz the decoder
    * would emit. */
  private[operators] def opusHead(pkt: Array[Byte]): Option[(Int, Int)] = {
    if (pkt.length < 19) return None
    val magic = "OpusHead".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = 0
    while (i < 8) { if (pkt(i) != magic(i)) return None; i += 1 }
    if ((u(pkt(8)) >>> 4) != 0) return None // incompatible major version
    val channels = u(pkt(9))
    if (channels == 0) return None
    val inputRate = le32(pkt, 12)
    Some((if (inputRate > 0) inputRate else 48000, channels))
  }

  /** Vorbis identification header (Vorbis I spec §4.2.2): packet type
    * 0x01 + "vorbis", vorbis_version 0, channels ≥ 1, 32-bit LE sample
    * rate > 0, and the mandated framing bit closing the 30-byte
    * packet. */
  private[operators] def vorbisIdHeader(pkt: Array[Byte]): Option[(Int, Int)] = {
    if (pkt.length < 30) return None
    if (u(pkt(0)) != 1) return None
    if (!(pkt(1) == 'v' && pkt(2) == 'o' && pkt(3) == 'r' &&
      pkt(4) == 'b' && pkt(5) == 'i' && pkt(6) == 's')) return None
    if (le32(pkt, 7) != 0) return None      // vorbis_version
    val channels = u(pkt(11))
    if (channels == 0) return None
    val rate = le32(pkt, 12)
    if (rate <= 0) return None
    if ((u(pkt(29)) & 1) != 1) return None  // framing flag
    Some((rate, channels))
  }

  /** OGG-contained audio (the remaining common container after
    * WAV/AIFF/AU/FLAC/MP3): parse the first page's first packet and
    * read whichever identification header it carries. Opus is tried
    * first only because its magic check is cheaper; the magics are
    * disjoint so order cannot change the result. */
  private[operators] def oggAudioHeader(p: Array[Byte]): Option[(Int, Int)] =
    oggFirstPacket(p).flatMap(pkt =>
      opusHead(pkt).orElse(vorbisIdHeader(pkt)))

  /** FLAC STREAMINFO parse (format spec: RFC 9639 §8.2 / flac format.html).
    * Layout: "fLaC" magic, then metadata blocks — the FIRST block is
    * mandated to be STREAMINFO (type 0, 34 bytes): within it, the
    * 20-bit sample rate starts at byte 10 and the 3-bit (channels-1)
    * field follows it. Truncated/garbled payloads (bad magic, wrong
    * first-block type, short buffer, zero sample rate — forbidden by
    * spec) → None, never a throw. */
  private[operators] def flacStreamInfo(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 8 + 34) return None
    if (!(p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C')) return None
    if ((u(p(4)) & 0x7f) != 0) return None // first block must be STREAMINFO
    // block length (24-bit big-endian) must be the mandated 34
    if (((u(p(5)) << 16) | (u(p(6)) << 8) | u(p(7))) != 34) return None
    val b = 8 // STREAMINFO payload start
    val sampleRate =
      (u(p(b + 10)) << 12) | (u(p(b + 11)) << 4) | (u(p(b + 12)) >>> 4)
    val channels = ((u(p(b + 12)) >>> 1) & 0x7) + 1
    if (sampleRate == 0) None else Some((sampleRate, channels))
  }

  /** One parsed MPEG audio frame header: (version, layer, rateIdx,
    * sampleRate, channels, frameLenBytes). */
  private final case class Mp3Header(version: Int, layer: Int,
      rateIdx: Int, rate: Int, channels: Int, frameLen: Int)

  /** Bitrate tables (kbps), ISO 11172-3 table B.1 / 13818-3 — indexed
    * by bitrateIdx-1 (0 = free format, rejected below; 15 = bad). */
  private val kbpsV1L1 =
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val kbpsV1L2 =
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val kbpsV1L3 =
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val kbpsV2L1 =
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val kbpsV2L23 =
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private def mp3HeaderAt(p: Array[Byte], i: Int): Option[Mp3Header] = {
    if (i < 0 || i + 4 > p.length) return None
    if (!(u(p(i)) == 0xff && (u(p(i + 1)) & 0xe0) == 0xe0)) return None
    val version = (u(p(i + 1)) >>> 3) & 0x3 // 0=2.5, 1=reserved, 2=V2, 3=V1
    val layer = (u(p(i + 1)) >>> 1) & 0x3   // 3=L1, 2=L2, 1=L3, 0=reserved
    val bitrateIdx = (u(p(i + 2)) >>> 4) & 0xf
    val rateIdx = (u(p(i + 2)) >>> 2) & 0x3
    val padding = (u(p(i + 2)) >>> 1) & 0x1
    val mode = (u(p(i + 3)) >>> 6) & 0x3
    // free format (bitrateIdx 0) is rejected along with the reserved
    // values: its frame length is unknowable, so the two-frame
    // validation below cannot run, and accepting it would reopen the
    // false-sync hole on high-entropy non-MP3 payloads
    if (version == 1 || layer == 0 || bitrateIdx == 0 || bitrateIdx == 0xf ||
      rateIdx == 3) return None
    val base = Array(44100, 48000, 32000)(rateIdx)
    val rate = version match {
      case 3 => base      // MPEG1
      case 2 => base / 2  // MPEG2
      case _ => base / 4  // MPEG2.5
    }
    val v1 = version == 3
    val kbps = (layer, v1) match {
      case (3, true)  => kbpsV1L1(bitrateIdx - 1)
      case (2, true)  => kbpsV1L2(bitrateIdx - 1)
      case (1, true)  => kbpsV1L3(bitrateIdx - 1)
      case (3, false) => kbpsV2L1(bitrateIdx - 1)
      case _          => kbpsV2L23(bitrateIdx - 1)
    }
    val frameLen =
      if (layer == 3) (12000 * kbps / rate + padding) * 4 // Layer I
      else if (layer == 1 && !v1) 72000 * kbps / rate + padding // L3 V2/2.5
      else 144000 * kbps / rate + padding
    Some(Mp3Header(version, layer, rateIdx, rate,
      if (mode == 3) 1 else 2, frameLen))
  }

  /** MPEG audio (MP3) frame-header parse (ISO/IEC 11172-3 §2.4.1.3 /
    * 13818-3): a leading ID3v2 tag is skipped via its syncsafe length,
    * then a bounded resync hunt looks for a valid 4-byte header. A lone
    * valid-looking header is NOT enough — ~1 in 5000 random byte pairs
    * passes the field checks, which over a 4 KB scan window would
    * fabricate metadata for half of all high-entropy non-MP3 payloads —
    * so a candidate is accepted only when a SECOND header with the same
    * version/layer/sample-rate sits exactly one computed frame length
    * ahead (the standard detector move), or — for a truncated
    * single-frame file — the header sits at the STREAM START (offset 0
    * or right after the ID3 tag, where a real MP3's first frame lives)
    * and the payload still contains the full computed frame. Both
    * anchor conditions are load-bearing: frame-contained alone still
    * accepted any random 4 KB blob whose pseudo-header's frame
    * happened to end within 4 bytes of the payload end (~1/1000 odds,
    * caught by the 150-blob fuzz test), and the lone-frame path can
    * only ever fire in that ≤ 4-byte tail window because a payload
    * with ≥ 4 bytes after the frame reaches the second-header check
    * instead. A resync-after-junk stream truncated to a single frame
    * is therefore rejected — with neither a clean start nor a second
    * frame there is no second piece of evidence left.
    * Corrupt/no-sync → None, never a fabricated rate. */
  private[operators] def mp3FrameHeader(p: Array[Byte]): Option[(Int, Int)] = {
    var i = 0
    // ID3v2: "ID3" <ver:2> <flags:1> <size:4 syncsafe>
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val size = (u(p(6)) << 21) | (u(p(7)) << 14) | (u(p(8)) << 7) | u(p(9))
      i = 10 + size
    }
    // bounded resync scan: real decoders hunt for sync after junk; cap
    // the hunt so a huge non-MP3 binary costs O(window), not O(n)
    val scanStart = i
    val limit = math.min(p.length - 4, i + 4096)
    while (i <= limit) {
      mp3HeaderAt(p, i) match {
        case Some(h) =>
          val next = i + h.frameLen
          val confirmed =
            if (next + 4 <= p.length)
              mp3HeaderAt(p, next).exists(n =>
                n.version == h.version && n.layer == h.layer &&
                  n.rateIdx == h.rateIdx)
            else
              // Truncated single-frame concession, ANCHORED: the frame
              // must be fully contained AND start where a real MP3's
              // first frame starts (offset 0 / post-ID3). Containment
              // alone still passed random 4 KB blobs whose
              // pseudo-header's frame ended inside the 4-byte tail
              // window (see the scaladoc); start-anchoring cuts the
              // false-accept odds to ~1/5000 per payload × the tail
              // window, while every cleanly-truncated real file (frame
              // at stream start) still parses.
              i == scanStart && next <= p.length
          if (confirmed) return Some((h.rate, h.channels))
        case None => ()
      }
      i += 1
    }
    None
  }

  /** Real image decode: header-driven, format auto-detected by the
    * ImageIO registry. Returns None for undecodable/corrupt payloads
    * instead of failing the task — at 100 TB a corpus WILL contain
    * truncated files, and one bad record must not kill a 10k-task
    * stage. */
  /** THE guarded payload→image read — decode and resize both route
    * through here so the load-bearing catch discipline cannot drift
    * between them. NonFatal, not just IOException: ImageIO plugins
    * throw IllegalArgumentException / CMMException / index errors on
    * malformed-but-not-truncated bodies (bogus ICC profiles,
    * dimension fields) — any of them must mark, not kill the stage. */
  private def readImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    readImage(payload).map(img => (img.getWidth, img.getHeight))

  /** Feature extraction for one record: REAL dimensions for image
    * kinds and REAL header metadata for audio kinds (-1 marks an
    * undecodable payload); remaining kinds (video) get the
    * deterministic byte-length fake (STUB — no JDK video codecs) so
    * the pipeline shape is exercised end-to-end for every modality. */
  private def decodeOne(md: java.security.MessageDigest)(
      r: MediaRecord): MediaFeatures = {
    // a NULL payload (e.g. a null-text document through
    // mediaFromDocuments — encode(NULL) is NULL) is one more
    // undecodable record, not a task-killing NPE: every numeric field
    // takes the -1 marker and the hash is empty. n = -1 (not 0) keeps
    // "null payload" distinguishable from a genuine zero-byte payload.
    if (r.payload == null)
      return MediaFeatures(r.media_id, r.kind, -1, -1, -1, -1, -1, "")
    md.reset()
    val hash = md.digest(r.payload).take(8).map("%02x".format(_)).mkString
    val n = r.payload.length
    val (w, h) =
      if (isImage(r.kind)) decodeImage(r.payload).getOrElse((-1, -1))
      else if (isAudio(r.kind)) (-1, -1)
      else (n % 640, (n * 3) % 480)
    val (sr, ch) =
      if (isAudio(r.kind)) decodeAudio(r.payload).getOrElse((-1, -1))
      else (-1, -1)
    MediaFeatures(r.media_id, r.kind, n, w, h, sr, ch, hash)
  }

  /** Partition-batched decode: one expensive per-partition init (the
    * digest instance; a JNI decoder handle sits in the same position),
    * streamed over the iterator — constant memory, no per-row init
    * cost, no driver collect. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decodeOne(md))
    }
  }

  /** Resized media: for images a REAL decode → bilinear scale → PNG
    * re-encode; other kinds keep the deterministic stub slice (schema
    * mirrors what a real resize produces, so swapping in an audio
    * resampler later changes no plumbing). */
  final case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, payload: Array[Byte])

  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val real =
          if (r.payload == null) None
          else if (isImage(r.kind)) readImage(r.payload)
          else None
        real match {
          case Some(img) =>
            val scaled = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            ResizedMedia(r.media_id, "image/png", w, h, bos.toByteArray)
          case None =>
            // STUB for non-image kinds (and undecodable images): a
            // deterministic prefix proportional to the requested area.
            // A null payload degrades to the empty prefix (mark-don't-
            // throw, same rule as decodeOne).
            val p = if (r.payload == null) Array.emptyByteArray else r.payload
            val len = math.min(p.length, math.max(1, (w * h) / 64))
            ResizedMedia(r.media_id, r.kind, w, h, p.take(len))
        }
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
      // null payload → zero frames (mark-don't-throw; a video row with
      // no bytes simply contributes nothing to the exploded table)
      if (r.payload == null) Iterator.empty
      else r.payload.grouped(frameBytes).zipWithIndex.collect {
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

  // --- image near-duplicate dedup (q83) --------------------------------------
  //
  // The one LLM-pipeline dedup modality the engine did not cover
  // (VERDICT r16 #5): perceptual-hash image dedup. dHash — the
  // classic difference hash: downsample to a (w+1)×h grayscale grid,
  // bit k = pixel(x,y) brighter than its right neighbor — is pure
  // integer math over decoded pixels, so the whole pipeline is
  // engine-portable: the Spark side goes through REAL
  // javax.imageio PNG encode → decode → pixel extraction (the
  // production plumbing), while the DuckDB oracle recomputes the same
  // grid values arithmetically (PNG is lossless, so decoded pixels ==
  // synthesized pixels, bit for bit).
  //
  // Candidate generation is the q31 banded-LSH shape: the 64-bit
  // dHash splits into 4 × 16-bit bands; a pair collides iff SOME band
  // matches exactly. With the verify threshold τ = imgDupBits = 2 and
  // 4 bands this is EXHAUSTIVE by pigeonhole (τ < bands ⇒ ≤ τ
  // differing bits cannot touch every band), so the banded survivors
  // equal the exact all-pairs answer — hash-gated against a DuckDB
  // O(N²) oracle, no recall floor needed. At 100 TB the band join is
  // the scale path: shuffle keys are (band, 16-bit value), candidate
  // work ∝ colliding pairs, never N².

  /** Synthetic-image grid: 9 wide × 8 tall ⇒ 8×8 = 64 dHash bits. */
  val imgW = 9
  val imgH = 8
  /** Planted near-dup group count (doc_id % imgGroups shares a base
    * pattern; each doc perturbs ONE last-column pixel ⇒ ≤ 1 differing
    * dHash bit per doc, ≤ 2 per same-group pair). */
  val imgGroups = 50
  /** Exact Hamming verify threshold — MUST stay < the band count (4)
    * for the banding to be exhaustive (see the section doc). */
  val imgDupBits = 2

  /** The deterministic grayscale value of grid cell (x, y) for the
    * image of `docId` — the ONE pixel definition, mirrored verbatim in
    * q83's oracle SQL. Positive integer math only (both engines agree
    * on % for positive operands). */
  private[operators] def synthPixel(docId: Long, x: Int, y: Int): Int = {
    val g = docId % imgGroups
    val perturb = if (x == imgW - 1 && y == docId % imgH) 97L else 0L
    (((g + 1) * (x * 11 + y * 29 + 7) + x * y * ((g % 13) + 1) + perturb)
      % 251).toInt
  }

  /** Documents rendered as REAL PNG images of their synthetic pixel
    * grids — the testdata carries no binary image column, so the
    * corpus is derived deterministically (the q40 pattern, image
    * form): partition-batched javax.imageio encode, one encoder pass
    * per row, no driver collect. */
  def imagesFromDocuments(spark: SparkSession, sfDir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            imgW, imgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < imgH) {
            var x = 0
            while (x < imgW) {
              val v = synthPixel(id, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "image/png", bos.toByteArray)
        }
      }
  }

  /** 63-bit dHash of a decoded image: bit (y·8 + x) set iff grid cell
    * (x, y) is brighter than (x+1, y); the (7,7) comparison (bit 63)
    * is dropped so the hash packs into a BIGINT both engines can
    * shift into (DuckDB range-checks `1 << 63`). Undecodable or
    * wrong-shape payloads mark with None (mark-don't-throw). */
  private[operators] def dhashOf(payload: Array[Byte]): Option[Long] =
    readImage(payload).filter(i =>
      i.getWidth == imgW && i.getHeight == imgH).map { img =>
      def gray(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff
      var bits = 0L
      var y = 0
      while (y < imgH) {
        var x = 0
        while (x < imgW - 1) {
          val k = y * 8 + x
          if (k <= 62 && gray(x, y) > gray(x + 1, y)) bits |= 1L << k
          x += 1
        }
        y += 1
      }
      bits
    }

  /** (media_id, dhash) via the REAL decode path; undecodable rows are
    * dropped with a mark (they can neither duplicate nor be
    * duplicated — same one-sided rule as the invalid-norm vectors). */
  def imageDhash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(it =>
        it.flatMap(r => Option(r.payload).flatMap(dhashOf)
          .map(h => (r.media_id, h))))
      .toDF("doc_id", "dhash")
  }

  /** q83: image near-duplicate dedup — survivors of the dHash keeper
    * rule (drop every image with a LOWER-id partner within
    * [[imgDupBits]] Hamming bits). Banded candidate join + in-join
    * exact verify; exhaustive at this (τ, bands) pair, so hash-exact
    * vs the oracle's all-pairs SQL. */
  def q83ImageDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // materialized: consumed three times (both sides of the band
    // self-join + the final anti-join) — unmaterialized, the PNG
    // encode→decode pipeline would re-run per consumer, tripling the
    // dominant per-image cost
    val h = graft.Materialize(
      imageDhash(imagesFromDocuments(spark, sfDir)))
    val bands = h.select(col("doc_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), 16 * b)
            .bitwiseAND(lit(0xffffL)).as("bv"))): _*)).as("bk"))
      .select(col("doc_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val dropped = bands.select(col("doc_id").as("a"),
        col("dhash").as("ha"), col("band"), col("bv"))
      .join(bands.select(col("doc_id").as("b"), col("dhash").as("hb"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("a") < col("b") &&
        bit_count(col("ha").bitwiseXOR(col("hb"))) <= imgDupBits)
      .select(col("b").as("doc_id")).distinct()
    h.join(dropped, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** q40: metadata extraction over the binary payload column, expressed
    * in pure column functions (the oracle-checkable subset of the
    * non-image decode path — same deterministic dimension formulas,
    * first 16 hex of md5). */
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
