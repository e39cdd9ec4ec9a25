package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("decodeFeatures: partition-batched decode is deterministic and " +
    "schema-stable") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "n_bytes", "width", "height",
        "sample_rate", "channels", "content_hash"))
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

  test("resize keeps ids and scales non-image payloads deterministically") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length === media.count())
    resized.foreach { r =>
      assert(r.width === 64 && r.height === 64)
      assert(r.payload.length <= 64) // (64*64)/64 cap
      assert(r.payload.nonEmpty)
    }
  }

  /** A real encoded image: diagonal gradient so scaling has content. */
  private def encodedImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("image kinds decode REAL dimensions; corrupt payloads don't kill the task") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image/png", encodedImage(13, 7, "png")),
      Multimodal.MediaRecord(2L, "image/jpeg", encodedImage(32, 16, "jpg")),
      Multimodal.MediaRecord(3L, "image/png",
        encodedImage(13, 7, "png").take(20)), // truncated header
      Multimodal.MediaRecord(4L, "text/plain", "hello world".getBytes)))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).width === 13 && got(1L).height === 7)
    assert(got(2L).width === 32 && got(2L).height === 16)
    assert(got(3L).width === -1 && got(3L).height === -1) // marked, not thrown
    assert(got(4L).width === "hello world".length % 640)  // stub formula intact
  }

  /** A real WAV container: silence, but a fully valid RIFF header. */
  private def encodedWav(sampleRate: Float, channels: Int,
      frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(
        new Array[Byte](frames * fmt.getFrameSize)), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio kinds parse REAL header metadata; corrupt/non-audio marked -1") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio/wav", encodedWav(8000f, 2, 64)),
      Multimodal.MediaRecord(2L, "audio/wav", encodedWav(44100f, 1, 32)),
      Multimodal.MediaRecord(3L, "audio/wav",
        encodedWav(8000f, 2, 64).take(10)), // truncated RIFF header
      Multimodal.MediaRecord(4L, "image/png", encodedImage(5, 5, "png"))))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === 8000 && got(1L).channels === 2)
    assert(got(2L).sample_rate === 44100 && got(2L).channels === 1)
    assert(got(3L).sample_rate === -1 && got(3L).channels === -1)
    assert(got(4L).sample_rate === -1) // not an audio kind
    assert(got(1L).width === -1) // audio carries no image dims
  }

  /** A real FLAC prefix: "fLaC" magic + STREAMINFO block (type 0,
    * 34 bytes) with the 20-bit sample rate and 3-bit channels-1 packed
    * per the public spec (RFC 9639 §8.2). */
  private def encodedFlac(rate: Int, channels: Int): Array[Byte] = {
    val b = new Array[Byte](8 + 34)
    Array[Byte]('f', 'L', 'a', 'C').copyToArray(b)
    b(4) = 0x80.toByte // last-block flag, type 0 = STREAMINFO
    b(7) = 34          // 24-bit big-endian block length
    b(8 + 10) = ((rate >> 12) & 0xff).toByte
    b(8 + 11) = ((rate >> 4) & 0xff).toByte
    b(8 + 12) = (((rate & 0xf) << 4) | ((channels - 1) << 1)).toByte
    b
  }

  /** A real MPEG audio stream (ISO 11172-3 §2.4.1.3): TWO consecutive
    * frames of the given computed frame length — the detector demands
    * a consistent second frame (or a fully-contained lone frame), so a
    * realistic fixture carries both. Optionally behind an ID3v2 tag
    * with a syncsafe length. */
  private def encodedMp3(header: Array[Int], frameLen: Int,
      id3Junk: Int = 0): Array[Byte] = {
    val id3 =
      if (id3Junk == 0) Array.empty[Byte]
      else Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0,
        ((id3Junk >> 7) & 0x7f).toByte, (id3Junk & 0x7f).toByte) ++
        Array.fill(id3Junk)(0x55.toByte)
    val frame = header.map(_.toByte) ++
      Array.fill(frameLen - header.length)(0.toByte)
    id3 ++ frame ++ frame
  }

  test("MP3/FLAC header metadata parses from the real bitstream layouts") {
    val media = spark.createDataset(Seq(
      // FLAC 44100 Hz stereo / 96000 Hz mono
      Multimodal.MediaRecord(1L, "audio/flac", encodedFlac(44100, 2)),
      Multimodal.MediaRecord(2L, "audio/flac", encodedFlac(96000, 1)),
      // MPEG1 Layer III 128 kbps, rate index 0 = 44100, joint stereo;
      // frame = 144000*128/44100 = 417 bytes
      Multimodal.MediaRecord(3L, "audio/mpeg",
        encodedMp3(Array(0xff, 0xfb, 0x90, 0x40), frameLen = 417)),
      // same stream behind a 100-byte ID3v2 tag
      Multimodal.MediaRecord(4L, "audio/mpeg",
        encodedMp3(Array(0xff, 0xfb, 0x90, 0x40), frameLen = 417,
          id3Junk = 100)),
      // MPEG2.5 Layer III 16 kbps, rate index 2 = 32000/4 = 8000,
      // mono; frame = 72000*16/8000 = 144 bytes
      Multimodal.MediaRecord(5L, "audio/mpeg",
        encodedMp3(Array(0xff, 0xe3, 0x28, 0xc0), frameLen = 144)),
      // corrupt: FLAC magic but truncated before STREAMINFO ends
      Multimodal.MediaRecord(6L, "audio/flac",
        encodedFlac(44100, 2).take(20)),
      // corrupt: all-0xFF junk has sync bits but reserved version+
      // bitrate fields everywhere — must be rejected, not misparsed
      Multimodal.MediaRecord(7L, "audio/mpeg", Array.fill(64)(0xff.toByte)),
      // mislabeled kind: payload decides — FLAC bytes as audio/mpeg
      Multimodal.MediaRecord(8L, "audio/mpeg", encodedFlac(22050, 2))))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === 44100 && got(1L).channels === 2)
    assert(got(2L).sample_rate === 96000 && got(2L).channels === 1)
    assert(got(3L).sample_rate === 44100 && got(3L).channels === 2)
    assert(got(4L).sample_rate === 44100 && got(4L).channels === 2)
    assert(got(5L).sample_rate === 8000 && got(5L).channels === 1)
    assert(got(6L).sample_rate === -1 && got(6L).channels === -1)
    assert(got(7L).sample_rate === -1 && got(7L).channels === -1)
    assert(got(8L).sample_rate === 22050 && got(8L).channels === 2)
  }

  /** A real OGG first page (RFC 3533 §6): 27-byte header (capture
    * pattern, version, header_type, granule/serial/seq/crc) + lacing
    * table + packet. CRC left zero: the header parser reads structure
    * and the codec magics — a real demuxer validates the CRC before
    * decode, but for metadata the 12+ exact magic bytes are the
    * anti-false-sync evidence. */
  private def oggPage(packet: Array[Byte], bos: Boolean = true,
      version: Int = 0): Array[Byte] = {
    val lacing = Array.fill(packet.length / 255)(255) :+ (packet.length % 255)
    val header = new Array[Byte](27 + lacing.length)
    Array[Byte]('O', 'g', 'g', 'S').copyToArray(header)
    header(4) = version.toByte
    header(5) = if (bos) 0x02 else 0x00
    header(26) = lacing.length.toByte
    lacing.zipWithIndex.foreach { case (v, i) => header(27 + i) = v.toByte }
    header ++ packet
  }

  /** RFC 7845 §5.1 OpusHead id packet (19 bytes + optional padding to
    * exercise multi-segment lacing). */
  private def opusHeadPkt(inputRate: Int, channels: Int,
      padTo: Int = 0): Array[Byte] = {
    val b = new Array[Byte](math.max(19, padTo))
    "OpusHead".getBytes("US-ASCII").copyToArray(b)
    b(8) = 1 // version 1: major nibble 0
    b(9) = channels.toByte
    b(12) = (inputRate & 0xff).toByte
    b(13) = ((inputRate >> 8) & 0xff).toByte
    b(14) = ((inputRate >> 16) & 0xff).toByte
    b(15) = ((inputRate >> 24) & 0xff).toByte
    b
  }

  /** Vorbis I §4.2.2 identification header (30 bytes). */
  private def vorbisIdPkt(rate: Int, channels: Int,
      framing: Int = 1, version: Int = 0): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
    b(7) = (version & 0xff).toByte // vorbis_version (LE), 0 mandated
    b(11) = channels.toByte
    b(12) = (rate & 0xff).toByte
    b(13) = ((rate >> 8) & 0xff).toByte
    b(14) = ((rate >> 16) & 0xff).toByte
    b(29) = framing.toByte
    b
  }

  test("OGG Opus/Vorbis identification headers parse; structural " +
    "violations are rejected") {
    val media = spark.createDataset(Seq(
      // Opus with a recorded 24 kHz input rate, stereo
      Multimodal.MediaRecord(1L, "audio/ogg",
        oggPage(opusHeadPkt(24000, 2))),
      // Opus with input rate 0 (unknown, allowed) → the 48 kHz the
      // decoder always emits
      Multimodal.MediaRecord(2L, "audio/opus",
        oggPage(opusHeadPkt(0, 1))),
      // a >255-byte first packet laced across two segments (channel
      // mapping tables make real OpusHeads this long)
      Multimodal.MediaRecord(3L, "audio/ogg",
        oggPage(opusHeadPkt(48000, 6, padTo = 300))),
      // Vorbis 44.1 kHz stereo
      Multimodal.MediaRecord(4L, "audio/ogg",
        oggPage(vorbisIdPkt(44100, 2))),
      // mislabeled kind: the payload decides, not the label
      Multimodal.MediaRecord(5L, "audio/mpeg",
        oggPage(vorbisIdPkt(22050, 1))),
      // negatives — each a single structural violation:
      Multimodal.MediaRecord(6L, "audio/ogg",
        oggPage(opusHeadPkt(24000, 2), bos = false)),   // BOS unset
      Multimodal.MediaRecord(7L, "audio/ogg",
        oggPage(opusHeadPkt(24000, 2), version = 1)),   // bad version
      Multimodal.MediaRecord(8L, "audio/ogg",
        oggPage(opusHeadPkt(24000, 2)).dropRight(4)),   // truncated packet
      Multimodal.MediaRecord(9L, "audio/ogg",
        oggPage(opusHeadPkt(24000, 0))),                // zero channels
      Multimodal.MediaRecord(10L, "audio/ogg",
        oggPage(vorbisIdPkt(44100, 2, framing = 0))),   // framing bit 0
      Multimodal.MediaRecord(11L, "audio/ogg",
        oggPage(vorbisIdPkt(44100, 2, version = 3))),   // vorbis_version≠0
      Multimodal.MediaRecord(12L, "audio/ogg",
        oggPage("NotACodecHeader----------------".getBytes)), // alien packet
      Multimodal.MediaRecord(13L, "audio/ogg", {        // random blob
        val r = new scala.util.Random(11); val b = new Array[Byte](512)
        r.nextBytes(b); b(0) = 'X'; b                   // never "OggS"
      })))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === 24000 && got(1L).channels === 2)
    assert(got(2L).sample_rate === 48000 && got(2L).channels === 1)
    assert(got(3L).sample_rate === 48000 && got(3L).channels === 6)
    assert(got(4L).sample_rate === 44100 && got(4L).channels === 2)
    assert(got(5L).sample_rate === 22050 && got(5L).channels === 1)
    (6L to 13L).foreach { id =>
      assert(got(id).sample_rate === -1 && got(id).channels === -1,
        s"record $id must be rejected")
    }
  }

  test("full audio-detection chain never fabricates metadata from " +
    "random payloads") {
    // every detector in decodeAudio's orElse chain (javax WAV/AIFF/AU,
    // FLAC, OGG Opus/Vorbis, MP3 incl. the truncated-frame concession)
    // fuzzed together: 50 seeds × three sizes spanning the short-blob
    // window the MP3 lone-frame rule was tightened for, the typical
    // header-probe size, and a full resync-scan window. Deterministic
    // seeds — a failure names its (seed, size) via media_id.
    val recs = for {
      seed <- 0 until 50
      (size, sIdx) <- Seq(300, 512, 4096).zipWithIndex
    } yield {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](size)
      r.nextBytes(b)
      Multimodal.MediaRecord(seed * 10L + sIdx, "audio/unknown", b)
    }
    val got = Multimodal.decodeFeatures(spark.createDataset(recs)).collect()
    val fabricated = got.filter(f => f.sample_rate != -1 || f.channels != -1)
    assert(fabricated.isEmpty,
      s"fabricated metadata for: ${fabricated.map(_.media_id).mkString(",")}")
  }

  test("MP3 detection demands a CONSISTENT second frame when the " +
    "payload is long enough to hold one") {
    // V1 Layer III 128 kbps @ 44100: frame length 144000*128/44100 = 417
    val h44 = Array(0xff, 0xfb, 0x90, 0x40).map(_.toByte)
    // same but rate index 1 = 48000 (frame length 384)
    val h48 = Array(0xff, 0xfb, 0x94, 0x40).map(_.toByte)
    val filler = Array.fill(413)(0x00.toByte)
    val media = spark.createDataset(Seq(
      // two consecutive consistent frames → parses
      Multimodal.MediaRecord(1L, "audio/mpeg",
        h44 ++ filler ++ h44 ++ filler),
      // second "frame" has a different sample rate → not an MP3 stream
      Multimodal.MediaRecord(2L, "audio/mpeg",
        h44 ++ filler ++ h48 ++ filler),
      // high-entropy non-MP3 payload (the Ogg/AAC stand-in): a lone
      // pseudo-sync must no longer fabricate metadata
      Multimodal.MediaRecord(3L, "audio/ogg", {
        val r = new scala.util.Random(42)
        val b = new Array[Byte](8192); r.nextBytes(b); b
      }),
      // SHORT high-entropy blobs: before the tightening, any
      // pseudo-sync whose computed frame ran past the payload end was
      // unconditionally accepted (~6% fabricated metadata on ~300-byte
      // random blobs). Now the lone-header path demands the payload
      // CONTAIN the full frame, so these must all reject. 20 seeds
      // cover the window deterministically.
      Multimodal.MediaRecord(4L, "audio/mpeg", {
        val r = new scala.util.Random(7)
        val b = new Array[Byte](300); r.nextBytes(b); b
      }),
      // truncated single-frame file whose payload ends EXACTLY at the
      // computed frame boundary (417 bytes for V1 L3 128k @ 44100):
      // the legitimate truncation concession — still accepted
      Multimodal.MediaRecord(5L, "audio/mpeg",
        h44 ++ Array.fill(413)(0x00.toByte)),
      // one byte SHORT of the full frame → frame cannot be contained,
      // lone header rejected
      Multimodal.MediaRecord(6L, "audio/mpeg",
        h44 ++ Array.fill(412)(0x00.toByte)),
      // ANCHORING boundary pair for the lone-frame concession:
      // a truncated single frame right after an ID3 tag starts at the
      // scan start — a real file shape, accepted...
      Multimodal.MediaRecord(7L, "audio/mpeg",
        Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
          Array.fill(20)(0x55.toByte) ++ h44 ++ filler),
      // ...but the same lone contained frame behind resync JUNK is
      // not: with neither a clean start nor a second frame there is
      // no second piece of evidence (this shape is exactly how random
      // 4 KB blobs were fabricating metadata)
      Multimodal.MediaRecord(8L, "audio/mpeg",
        Array.fill(33)(0x11.toByte) ++ h44 ++ filler)))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === 44100 && got(1L).channels === 2)
    assert(got(2L).sample_rate === -1 && got(2L).channels === -1)
    assert(got(3L).sample_rate === -1 && got(3L).channels === -1)
    assert(got(4L).sample_rate === -1 && got(4L).channels === -1)
    assert(got(5L).sample_rate === 44100 && got(5L).channels === 2)
    assert(got(7L).sample_rate === 44100 && got(7L).channels === 2)
    assert(got(8L).sample_rate === -1 && got(8L).channels === -1)
    assert(got(6L).sample_rate === -1 && got(6L).channels === -1)
    // sweep 20 short random payloads through the parser directly —
    // the false-accept window is now only frames ending in the last
    // 4 bytes of the payload, which random bytes should never hit
    for (seed <- 0 until 20) {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](300); r.nextBytes(b)
      assert(Multimodal.mp3FrameHeader(b).isEmpty,
        s"seed $seed fabricated MP3 metadata from a 300-byte random blob")
    }
  }

  test("MP3 Layer I/II bitrate tables and frame sizes parse") {
    // V1 Layer I (layer bits 11): idx 4 = 128 kbps @ 32000 (rate idx 2),
    // stereo; frame = (12000*128/32000 + 0)*4 = 192 bytes
    val l1 = Array(0xff, 0xff, 0x48, 0x00).map(_.toByte)
    // V1 Layer II (layer bits 10): idx 8 = 128 kbps @ 44100, mono;
    // frame = 144000*128/44100 = 417 bytes
    val l2 = Array(0xff, 0xfd, 0x80, 0xc0).map(_.toByte)
    val media = spark.createDataset(Seq(
      // two consistent Layer I frames back-to-back
      Multimodal.MediaRecord(1L, "audio/mpeg",
        l1 ++ Array.fill(188)(0x00.toByte) ++ l1 ++ Array.fill(188)(0x00.toByte)),
      // two consistent Layer II frames
      Multimodal.MediaRecord(2L, "audio/mpeg",
        l2 ++ Array.fill(413)(0x00.toByte) ++ l2 ++ Array.fill(413)(0x00.toByte))))
    val got = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(1L).sample_rate === 32000 && got(1L).channels === 2)
    assert(got(2L).sample_rate === 44100 && got(2L).channels === 1)
  }

  test("image resize re-encodes a genuinely scaled image") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image/jpeg", encodedImage(32, 16, "jpg"))))
    val out = Multimodal.resize(media, 8, 4).collect().head
    assert(out.kind === "image/png" && out.width === 8 && out.height === 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(back.getWidth === 8 && back.getHeight === 4)
    // gradient content survives scaling: left edge darker red than right
    def red(x: Int, y: Int) = (back.getRGB(x, y) >> 16) & 0xff
    assert(red(0, 0) < red(7, 0))
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

  test("null payload/kind rows are marked, never thrown on: decode, " +
    "resize and frame sampling stay total") {
    // a null-text document through mediaFromDocuments yields a NULL
    // payload (encode(NULL) = NULL); a generic media source can carry
    // a null kind too — the module's mark-don't-throw contract says
    // one such record must degrade to markers, not NPE a 10k-task stage
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "text/plain", "hello".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, "text/plain", null),
      Multimodal.MediaRecord(3L, null, "bytes".getBytes("UTF-8")),
      Multimodal.MediaRecord(4L, "image/png", null)).toDS()
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size === 4)
    // null payload → all-marker row, empty hash, kind passed through
    assert(feats(2L).n_bytes === -1 && feats(2L).width === -1 &&
      feats(2L).content_hash === "")
    assert(feats(4L).n_bytes === -1 && feats(4L).sample_rate === -1)
    // null kind with real bytes → stub-dimension branch, real hash
    assert(feats(3L).n_bytes === 5 && feats(3L).content_hash.nonEmpty)
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length === 4)
    assert(resized.filter(r => r.media_id == 2L || r.media_id == 4L)
      .forall(_.payload.isEmpty))
    val frames = Multimodal.frameSampleStub(media, 4, 1).collect()
    // null-payload rows contribute zero frames; the others explode
    assert(!frames.exists(f => f.media_id == 2L || f.media_id == 4L))
    assert(frames.exists(_.media_id == 1L) && frames.exists(_.media_id == 3L))
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

  test("q83 pipeline: PNG encode→decode round-trips the synthetic " +
    "pixels exactly, and the banded join equals the exact all-pairs " +
    "answer (exhaustive at tau=2 under 4 bands)") {
    import spark.implicits._
    // decoded dHash == the arithmetic dHash straight off synthPixel —
    // the lossless-PNG premise that makes the DuckDB oracle sound
    def arithmeticDhash(id: Long): Long = {
      var bits = 0L
      for (y <- 0 until Multimodal.imgH; x <- 0 until Multimodal.imgW - 1) {
        val k = y * 8 + x
        if (k <= 62 && Multimodal.synthPixel(id, x, y) >
            Multimodal.synthPixel(id, x + 1, y)) bits |= 1L << k
      }
      bits
    }
    val hashes = Multimodal
      .imageDhash(Multimodal.imagesFromDocuments(spark, sfDir))
      .as[(Long, Long)].collect().toMap
    assert(hashes.nonEmpty)
    hashes.foreach { case (id, h) =>
      assert(h === arithmeticDhash(id),
        s"doc $id: decoded dHash diverged from the pixel arithmetic")
    }
    // exact all-pairs keeper (small fixture) == the banded survivors
    val ids = hashes.keys.toSeq.sorted
    val exactDropped = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <=
        Multimodal.imgDupBits
    } yield b).toSet
    val survivors = Multimodal.q83ImageDedup(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === (ids.toSet -- exactDropped),
      "banded survivors diverged from the exact all-pairs answer")
    // the fixture actually plants near-dups — a vacuous corpus would
    // make the equality above prove nothing
    assert(exactDropped.nonEmpty)
  }
}
