package graft.operators

import graft.functions.VectorExpressions.dotF
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.4 extension surface):
  * image/audio/video as opaque `binary` columns with typed metadata,
  * and decode / feature-extract / resize / frame-sample as distributed
  * per-partition stages.
  *
  * IMAGE DECODE IS REAL: the JDK ships PNG/JPEG/GIF/BMP codecs
  * (`javax.imageio`), so image rows carry genuine PNG payloads and
  * `decode` parses them — width/height/mean-luminance come from actual
  * pixels, not metadata. AUDIO DECODE IS REAL: `javax.sound.sampled`
  * parses WAV/AIFF/AU, so sample rate / frame count / mean amplitude
  * come from actual PCM frames. VIDEO IS REAL ON BOTH AXES: container
  * parsing walks ISO-BMFF boxes (`moov`/`mvhd`/`tkhd` give duration
  * and display size) AND per-frame pixel decode is real for MJPEG in
  * BOTH containers: [[decodeVideoFrames]] walks the RIFF `movi` chunks
  * of an AVI, and [[decodeMp4Frames]] resolves coded samples through
  * MP4's own `stsd`/`stsc`/`stsz`/`stco` sample tables — in each case
  * every frame is a complete JPEG the JDK codec decodes. Only
  * inter-frame coded streams (H.264 etc.) keep a byte-level stand-in,
  * because the JDK ships no inter-frame codec.
  * The schema contract, the `mapPartitions` batch shape (one JVM-side
  * batch per partition, the Scala analogue of `mapInPandas`),
  * partitioning, and the embedding hand-off into [[Similarity]] are
  * identical for all paths, so an external codec is a one-function
  * swap.
  *
  * Scale design: payload bytes never shuffle — decode/featurize run
  * map-side on the scan partitions; only the small derived columns
  * (metadata, embeddings) flow into joins. Frame sampling emits long
  * format so downstream operators stay relational.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, format: String)
  /** Audio rows carry the decoded stream properties in the optional
    * fields (None for image/video); `mean_intensity` is pixel luminance
    * 0–255 for images, mean |amplitude| scaled to 0–255 for audio. */
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, mean_intensity: Double, checksum: String,
      sample_rate: Option[Int] = None, n_frames: Option[Long] = None,
      duration_sec: Option[Double] = None)
  final case class FrameRow(media_id: Long, frame_idx: Int,
      frame_checksum: String)
  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Deterministic fake corpus: image rows carry REAL PNG payloads
    * (JDK codec) with md5-seeded pixels; audio rows carry REAL WAV
    * payloads (JDK `javax.sound.sampled`) with md5-seeded sine tones;
    * video rows carry REAL (minimal, valid) MP4 containers — `moov`
    * metadata genuinely parseable, only the coded samples in `mdat`
    * are md5 filler (the JDK ships no video codec). */
  def fakeMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 64 + (i % 8).toInt * 32
      val h = 64 + (i % 5).toInt * 48
      kind match {
        case "image" => MediaRow(i, kind, pngBytes(i, w, h), w, h, "png")
        case "audio" =>
          MediaRow(i, kind, wavBytes(i, 400 + (i % 64).toInt * 50), w, h, "wav")
        case _ =>
          MediaRow(i, kind,
            mp4Bytes(i, 1000 + (i % 60).toInt * 250, w, h), w, h, "mp4")
      }
    }
  }

  /** A real PNG: deterministic md5-seeded pixel pattern, encoded with
    * the JDK's built-in codec. */
  private[graft] def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"media|$seed")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = digest((x * 31 + y * 17) % 16) & 0xff
        img.setRGB(x, y, (((v + x) & 0xff) << 16) | (((v + y) & 0xff) << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via the JDK codec: (width, height, mean
    * luminance in 0–255, ITU-R 601 weights) from the actual pixels.
    * None when the payload is not a decodable image — including data
    * with a valid magic but a corrupt body, where ImageIO.read throws
    * (IIOException) rather than returning null. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    scala.util.Try(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))).toOption.flatMap(Option(_)).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, sum / (w.toLong * h))
    }

  /** 64-bit average-hash (aHash) perceptual image fingerprint: decode
    * the REAL pixels, mean luminance per cell of an 8×8 grid, bit b set
    * iff cell b's mean exceeds the global mean. All arithmetic is exact
    * integer (ITU-R 601 luminance ×1000, cross-multiplied comparison
    * `cell_sum * 64 > total` instead of divided means) — no float
    * rounding, no library rescaling, so the hash is a pure function of
    * the pixel grid: bit-identical across JVMs and partitionings, and
    * EXACTLY invariant under a uniform brightness shift (the shift
    * cancels in the cross-multiplication).
    *
    * Near-dup semantics: perceptually identical images (re-encodes,
    * brightness shifts) land at hamming distance 0–3; unrelated images
    * at ~32. Pairing via 4×16-bit band blocking is then exact for
    * distance ≤ 3 by pigeonhole — the same banding guarantee SimHash
    * (d5–d7) uses, here over real decoded media.
    */
  private[graft] def aHash64(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "aHash64: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8, s"aHash64: image too small ($w x $h)")
    val bw = w / 8
    val bh = h / 8
    val sums = new Array[Long](64)
    var y = 0
    while (y < bh * 8) {
      var x = 0
      while (x < bw * 8) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
          (rgb & 0xff) * 114).toLong
        sums((y / bh) * 8 + x / bw) += lum
        x += 1
      }
      y += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) { if (sums(i) * 64 > total) hash |= 1L << i; i += 1 }
    hash
  }

  /** Near-duplicate image corpus for the m4 gate: `nGroups` triples of
    * REAL 64×64 PNGs. Variant 0 is an md5-seeded 8×8 block pattern
    * (each block uniform gray 40 or 216); variant 1 shifts every pixel
    * +8 (aHash distance 0 — exact invariance); variant 2 inverts two
    * seed-chosen blocks (aHash distance exactly 2: the global mean
    * moves by at most 2·176/64 ≈ 5.5, far inside the 40/216 margin, so
    * no other bit can flip). Cross-group patterns are independent md5
    * draws (expected distance 32; ≤3 has probability ~2^-47 per pair
    * and is additionally pinned empirically in MultimodalSpec). */
  def fakeNearDupImages(spark: SparkSession, nGroups: Int,
      partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, nGroups * 3L, 1, partitions).map { i =>
      val g = (i / 3).toInt
      val v = (i % 3).toInt
      val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"phash|$g")
      val baseBits = java.nio.ByteBuffer.wrap(digest).getLong
      val delta = if (v == 1) 8 else 0
      // 30g ≡ 47 (mod 64) has no solution (gcd 2 ∤ 47): always distinct
      val flips = if (v == 2) Set(g % 64, (g * 31 + 17) % 64) else Set.empty[Int]
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var b = 0
      while (b < 64) {
        val high = ((baseBits >>> b & 1L) == 1L) ^ flips.contains(b)
        val lum = (if (high) 216 else 40) + delta
        val rgb = lum << 16 | lum << 8 | lum
        val bx = (b % 8) * 8
        val by = (b / 8) * 8
        var y = by
        while (y < by + 8) {
          var x = bx
          while (x < bx + 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        b += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      MediaRow(i, "image", out.toByteArray, 64, 64, "png")
    }
  }

  /** A real WAV: deterministic md5-seeded sine tone (seed-derived
    * frequency and amplitude), 16-bit mono little-endian PCM, encoded
    * with the JDK's built-in `javax.sound.sampled` writer. */
  private[graft] def wavBytes(seed: Long, nSamples: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"media|$seed")
    val freq = 200.0 + (digest(0) & 0xff) * 10.0 // 200..2750 Hz
    val amp = 0.25 + (digest(1) & 0xff) / 1024.0 // 0.25..0.5 of full scale
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** 64-bit audio energy fingerprint — the aural sibling of
    * [[aHash64]]: decode REAL PCM frames, sum |amplitude| over 64 equal
    * time windows, bit w set iff window w's energy exceeds the global
    * mean. Cross-multiplied exact-integer comparison
    * (`win_sum * 64 > total`), so the fingerprint is EXACTLY invariant
    * under any uniform gain (the gain factor cancels) and bit-identical
    * across JVMs. Trailing samples beyond the last full window are
    * ignored (a fixed truncation, not a rounding). */
  private[graft] def audioHash64(bytes: Array[Byte]): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"audioHash64: expected 16-bit mono PCM, got $fmt")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    require(n >= 64, s"audioHash64: too few samples ($n)")
    val winLen = n / 64
    val sums = new Array[Long](64)
    var w = 0
    while (w < 64) {
      var i = w * winLen
      val end = i + winLen
      var s = 0L
      while (i < end) {
        val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toLong
        s += math.abs(v)
        i += 1
      }
      sums(w) = s
      w += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) { if (sums(i) * 64 > total) hash |= 1L << i; i += 1 }
    hash
  }

  /** Near-duplicate audio corpus for the m5 gate: triples of REAL WAVs
    * built from 64 constant-|amplitude| square-wave windows (amplitude
    * 1000 or 6000 per md5 bit of the group seed — window energy is then
    * EXACTLY amp·winLen). Variant 0 is the base; variant 1 doubles
    * every sample (exact ×2 gain, no clipping — fingerprint distance
    * 0); variant 2 swaps two seed-chosen windows quiet↔loud
    * (fingerprint distance exactly 2: a window's class is decided by
    * `amp·64 > Σamps`, and two swaps move Σamps by ≤10000, far inside
    * the 64000/384000 band edges for any mixed pattern). */
  def fakeNearDupAudio(spark: SparkSession, nGroups: Int,
      partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    val winLen = 40
    spark.range(0, nGroups * 3L, 1, partitions).map { i =>
      val g = (i / 3).toInt
      val v = (i % 3).toInt
      val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"ahash|$g")
      val baseBits = java.nio.ByteBuffer.wrap(digest).getLong
      val gain = if (v == 1) 2 else 1
      val flips = if (v == 2) Set(g % 64, (g * 31 + 17) % 64) else Set.empty[Int]
      val pcm = new Array[Byte](64 * winLen * 2)
      var w = 0
      while (w < 64) {
        val loud = ((baseBits >>> w & 1L) == 1L) ^ flips.contains(w)
        val amp = (if (loud) 6000 else 1000) * gain
        var k = 0
        while (k < winLen) {
          val s = if (k % 2 == 0) amp else -amp // square wave: |s| = amp
          val idx = (w * winLen + k) * 2
          pcm(idx) = (s & 0xff).toByte
          pcm(idx + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        w += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (64L * winLen))
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      MediaRow(i, "audio", out.toByteArray, 0, 0, "wav")
    }
  }

  /** REAL audio decode via the JDK parser: (sample rate, channels,
    * frames, mean |amplitude| scaled to 0–255) from the actual PCM
    * frames. None when the payload is not parseable 16-bit signed PCM
    * (the WAV/AIFF/AU formats the JDK ships readers for). */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] =
    scala.util.Try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        val data = ais.readAllBytes()
        val n = data.length / 2
        var sum = 0.0
        var i = 0
        while (i < n) {
          val s = (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
          sum += math.abs(s)
          i += 1
        }
        val channels = fmt.getChannels
        (fmt.getSampleRate.toInt, channels, n.toLong / channels,
          if (n == 0) 0.0 else sum / n / 32768.0 * 255.0)
      } finally ais.close()
    }.toOption

  /** A real (minimal, valid) MP4 container: `ftyp` + `moov` holding an
    * `mvhd` (timescale/duration) and one `trak`/`tkhd` (16.16
    * fixed-point width/height), then an `mdat` of md5-derived filler
    * standing in for coded samples. Box layout per ISO/IEC 14496-12;
    * everything a JDK-only pipeline can genuinely produce — the coded
    * stream itself is the only fake. */
  private[graft] def mp4Bytes(seed: Long, durationMs: Int, w: Int,
      h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + 216 + 8 + 256)
    def box(size: Int, typ: String): Unit = {
      bb.putInt(size); bb.put(typ.getBytes("US-ASCII"))
    }
    box(24, "ftyp")
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0x200)
    bb.put("isommp42".getBytes("US-ASCII"))
    box(216, "moov")
    box(108, "mvhd")
    bb.putInt(0) // version 0 + flags
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(1000) // timescale: ms
    bb.putInt(durationMs)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    bb.putLong(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (0 until 6).foreach(_ => bb.putInt(0)) // predefined
    bb.putInt(2) // next track id
    box(100, "trak")
    box(92, "tkhd")
    bb.putInt(0x7) // version 0, flags: enabled+in-movie+in-preview
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(1); bb.putInt(0) // track id, reserved
    bb.putInt(durationMs)
    bb.putLong(0) // reserved
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(w << 16); bb.putInt(h << 16) // 16.16 fixed
    box(8 + 256, "mdat")
    val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"media|$seed")
    (0 until 256).foreach(i => bb.put(digest(i % 16)))
    bb.array()
  }

  /** REAL MP4 container parse (no codec needed): walk the top-level
    * boxes for `moov`, read `mvhd`'s timescale/duration and the first
    * `tkhd`'s 16.16 width/height. None for anything malformed —
    * truncated boxes, absurd sizes, missing `moov`/`mvhd`. Bounds are
    * checked before every read, so corrupt payloads degrade to the
    * byte-stats fallback instead of throwing on an executor. */
  private[graft] def parseMp4(bytes: Array[Byte]): Option[(Double, Int, Int)] = {
    def beInt(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def typ(o: Int): String = new String(bytes, o + 4, 4, "US-ASCII")
    def findBox(from: Int, until: Int, name: String): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size = beInt(o)
        if (size < 8 || o + size > until) return None
        if (typ(o) == name) return Some((o + 8, (o + size).toInt))
        o += size.toInt
      }
      None
    }
    if (bytes.length < 8) return None
    for {
      (moovStart, moovEnd) <- findBox(0, bytes.length, "moov")
      (mvhd, mvhdEnd) <- findBox(moovStart, moovEnd, "mvhd")
      if mvhd + 20 <= mvhdEnd && (beInt(mvhd) >>> 24) == 0 // version 0
      timescale = beInt(mvhd + 12)
      if timescale > 0
      duration = beInt(mvhd + 16)
      (trak, trakEnd) <- findBox(moovStart, moovEnd, "trak")
      (tkhd, tkhdEnd) <- findBox(trak, trakEnd, "tkhd")
      if tkhdEnd - tkhd >= 84 && (beInt(tkhd) >>> 24) == 0
    } yield (duration.toDouble / timescale,
      (beInt(tkhdEnd - 8) >> 16).toInt, (beInt(tkhdEnd - 4) >> 16).toInt)
  }

  final case class VideoFrameRow(media_id: Long, frame_idx: Int,
      frame_w: Int, frame_h: Int, mean_lum: Double)

  /** A real MJPEG-in-MP4: ISO-BMFF with a COMPLETE video sample-table
    * chain (`moov/trak/mdia/minf/stbl` holding `stsd` with a `jpeg`
    * visual sample entry, `stts`, `stsc`, `stsz` per-sample sizes and
    * `stco` chunk offsets), locating genuine baseline JPEGs inside
    * `mdat`. Photo-JPEG ('jpeg') is the one MP4 video codec a JDK-only
    * pipeline can both write and decode — every coded sample is a
    * complete JPEG — so the MP4 frame-decode path carries no stub.
    * Box layout per ISO/IEC 14496-12 §8.5–8.7. */
  private[graft] def mp4MjpegBytes(seed: Long, nFrames: Int, w: Int,
      h: Int): Array[Byte] = {
    val frames = (0 until nFrames).map(f => jpegGray(frameLum(seed, f), w, h))
    val n = frames.size
    val stsdSize = 16 + 86 // header+verflags+count + one visual sample entry
    val sttsSize = 24
    val stscSize = 28
    val stszSize = 20 + 4 * n
    val stcoSize = 20
    val stblSize = 8 + stsdSize + sttsSize + stscSize + stszSize + stcoSize
    val minfSize = 8 + 20 + 36 + stblSize // vmhd + dinf/dref + stbl
    val mdiaSize = 8 + 32 + 33 + minfSize // mdhd + hdlr + minf
    val trakSize = 8 + 92 + mdiaSize // tkhd + mdia
    val moovSize = 8 + 108 + trakSize // mvhd + trak
    val mdatPayload = frames.map(_.length).sum
    val mdatOffset = 24 + moovSize + 8 // first sample's absolute offset
    val bb = java.nio.ByteBuffer.allocate(24 + moovSize + 8 + mdatPayload)
    def box(size: Int, typ: String): Unit = {
      bb.putInt(size); bb.put(typ.getBytes("US-ASCII"))
    }
    val durationMs = n * 40 // 25 fps at the movie's ms timescale
    box(24, "ftyp")
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0x200)
    bb.put("isommp42".getBytes("US-ASCII"))
    box(moovSize, "moov")
    box(108, "mvhd")
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // verflags, ctime, mtime
    bb.putInt(1000); bb.putInt(durationMs) // timescale ms, duration
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    bb.putLong(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2) // next track id
    box(trakSize, "trak")
    box(92, "tkhd")
    bb.putInt(0x7); bb.putInt(0); bb.putInt(0) // verflags, ctime, mtime
    bb.putInt(1); bb.putInt(0) // track id, reserved
    bb.putInt(durationMs)
    bb.putLong(0)
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(w << 16); bb.putInt(h << 16)
    box(mdiaSize, "mdia")
    box(32, "mdhd")
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // verflags, ctime, mtime
    bb.putInt(25); bb.putInt(n) // timescale 25 ticks/s, 1 tick per frame
    bb.putShort(0x55c4.toShort); bb.putShort(0) // language 'und', predefined
    box(33, "hdlr")
    bb.putInt(0); bb.putInt(0) // verflags, predefined
    bb.put("vide".getBytes("US-ASCII"))
    (0 until 3).foreach(_ => bb.putInt(0)) // reserved
    bb.put(0.toByte) // empty handler name
    box(minfSize, "minf")
    box(20, "vmhd")
    bb.putInt(0x1) // verflags: flag 1 per spec
    bb.putLong(0) // graphicsmode + opcolor
    box(36, "dinf")
    box(28, "dref")
    bb.putInt(0); bb.putInt(1) // verflags, entry count
    box(12, "url "); bb.putInt(0x1) // self-contained
    box(stblSize, "stbl")
    box(stsdSize, "stsd")
    bb.putInt(0); bb.putInt(1) // verflags, entry count
    box(86, "jpeg") // photo-JPEG visual sample entry
    (0 until 6).foreach(_ => bb.put(0.toByte)) // reserved
    bb.putShort(1) // data reference index
    (0 until 4).foreach(_ => bb.putInt(0)) // predefined/reserved
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    bb.putInt(0x00480000); bb.putInt(0x00480000) // 72 dpi
    bb.putInt(0) // reserved
    bb.putShort(1) // frame count per sample
    (0 until 32).foreach(_ => bb.put(0.toByte)) // compressor name
    bb.putShort(24); bb.putShort(-1) // depth, predefined
    box(24, "stts")
    bb.putInt(0); bb.putInt(1) // verflags, entry count
    bb.putInt(n); bb.putInt(1) // n samples, 1 tick each
    box(28, "stsc")
    bb.putInt(0); bb.putInt(1)
    bb.putInt(1); bb.putInt(n); bb.putInt(1) // chunk 1 holds all n samples
    box(stszSize, "stsz")
    bb.putInt(0); bb.putInt(0); bb.putInt(n) // verflags, variable sizes, count
    frames.foreach(f => bb.putInt(f.length))
    box(20, "stco")
    bb.putInt(0); bb.putInt(1); bb.putInt(mdatOffset)
    box(8 + mdatPayload, "mdat")
    frames.foreach(bb.put)
    bb.array()
  }

  /** REAL ISO-BMFF sample-table resolution: walk
    * `moov/trak/mdia/minf/stbl`, read the `stsd` entry's codec fourcc,
    * then locate every sample by the spec's own machinery — `stco`
    * chunk offsets, `stsc` samples-per-chunk runs, `stsz` sizes —
    * general (multi-chunk, run-length stsc), not fixture-shaped.
    * Returns (fourcc, coded sample payloads). None for anything
    * malformed: every read is bounds-checked, so corrupt payloads
    * degrade safely on executors. */
  private[graft] def parseMp4Frames(bytes: Array[Byte])
      : Option[(String, Seq[Array[Byte]])] = {
    def beInt(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def typ(o: Int): String = new String(bytes, o + 4, 4, "US-ASCII")
    def findBox(from: Int, until: Int, name: String): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size = beInt(o)
        if (size < 8 || o + size > until) return None
        if (typ(o) == name) return Some((o + 8, (o + size).toInt))
        o += size.toInt
      }
      None
    }
    if (bytes.length < 8) return None
    for {
      (moov, moovEnd) <- findBox(0, bytes.length, "moov")
      (trak, trakEnd) <- findBox(moov, moovEnd, "trak")
      (mdia, mdiaEnd) <- findBox(trak, trakEnd, "mdia")
      (minf, minfEnd) <- findBox(mdia, mdiaEnd, "minf")
      (stbl, stblEnd) <- findBox(minf, minfEnd, "stbl")
      (stsd, stsdEnd) <- findBox(stbl, stblEnd, "stsd")
      if stsd + 16 <= stsdEnd && beInt(stsd + 4) >= 1 // at least one entry
      fourcc = typ(stsd + 8)
      (stsz, stszEnd) <- findBox(stbl, stblEnd, "stsz")
      if stsz + 12 <= stszEnd
      uniform = beInt(stsz + 4)
      nSamples = beInt(stsz + 8).toInt
      if nSamples >= 0 && nSamples < (1 << 20)
      if uniform > 0 || stsz + 12 + 4L * nSamples <= stszEnd
      (stsc, stscEnd) <- findBox(stbl, stblEnd, "stsc")
      nRuns = beInt(stsc + 4).toInt
      if nRuns >= 1 && stsc + 8 + 12L * nRuns <= stscEnd
      (stco, stcoEnd) <- findBox(stbl, stblEnd, "stco")
      nChunks = beInt(stco + 4).toInt
      if nChunks >= 1 && stco + 8 + 4L * nChunks <= stcoEnd
    } yield {
      val sizes = (0 until nSamples).map(i =>
        if (uniform > 0) uniform.toInt else beInt(stsz + 12 + 4 * i).toInt)
      val runs = (0 until nRuns).map(r => // (firstChunk, samplesPerChunk)
        (beInt(stsc + 8 + 12 * r).toInt, beInt(stsc + 12 + 12 * r).toInt))
      val out = Seq.newBuilder[Array[Byte]]
      var sample = 0
      var chunk = 1
      while (chunk <= nChunks && sample < nSamples) {
        val spc = runs.reverse.find(_._1 <= chunk).map(_._2).getOrElse(0)
        var off = beInt(stco + 8 + 4 * (chunk - 1))
        var k = 0
        while (k < spc && sample < nSamples) {
          val sz = sizes(sample)
          if (sz < 0 || off < 0 || off + sz > bytes.length) return None
          out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      if (sample != nSamples) return None
      (fourcc, out.result())
    }
  }

  /** REAL per-frame MP4 video decode — the ISO-BMFF sibling of
    * [[decodeVideoFrames]]: resolve coded samples via the sample
    * tables, decode each photo-JPEG/MJPEG sample with the JDK codec,
    * one row per frame with true decoded dimensions and mean luminance.
    * Non-JPEG codecs (H.264 etc.) yield no rows here — they keep the
    * honest byte-stats fallback in [[decode]], since the JDK ships no
    * inter-frame codec. Payloads never leave the map stage. */
  def decodeMp4Frames(media: Dataset[MediaRow]): Dataset[VideoFrameRow] = {
    import media.sparkSession.implicits._
    val jpegCodecs = Set("jpeg", "mjpa", "mjpb", "MJPG")
    media.filter(_.format == "mp4").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        parseMp4Frames(m.bytes).toSeq.flatMap {
          case (fourcc, samples) if jpegCodecs.contains(fourcc) =>
            samples.zipWithIndex.flatMap { case (jpeg, idx) =>
              decodeImage(jpeg).map { case (fw, fh, mean) =>
                VideoFrameRow(m.media_id, idx, fw, fh, mean)
              }
            }
          case _ => Nil
        }
      }
    }
  }

  /** Deterministic MJPEG-in-MP4 corpus for the ISO-BMFF frame-decode
    * path: every video carries 2–7 real JPEG samples of md5-keyed solid
    * grays located by real sample tables, so per-frame decoded
    * luminance is independently predictable by the verdict query and
    * the DuckDB oracle. */
  def fakeMp4Videos(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val w = 40 + (i % 5).toInt * 8
      val h = 24 + (i % 4).toInt * 8
      MediaRow(i, "video", mp4MjpegBytes(i, 2 + (i % 6).toInt, w, h), w, h, "mp4")
    }
  }

  /** Per-frame luminance the generator encodes and the verdict query
    * re-derives: md5-keyed, kept away from the 0/255 rails so JPEG DC
    * quantization can't clamp. All three engines (generator, Spark
    * query, DuckDB oracle) compute it independently from the same md5. */
  private[graft] def frameLum(seed: Long, idx: Int): Int = {
    val hex = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"frame|$seed|$idx")
    16 + Integer.parseInt(hex.substring(0, 2), 16) % 224
  }

  /** A real baseline JPEG of a solid gray (l, l, l) frame — the one
    * image whose post-decode mean luminance is predictable (DC-only;
    * quantization moves it by at most ~1 code value). */
  private[graft] def jpegGray(l: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(l, l, l))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A real MJPEG-in-AVI container: RIFF `AVI ` with a spec-shaped
    * `hdrl` (avih + one `vids`/`MJPG` stream with its
    * BITMAPINFOHEADER) and a `movi` list of `00dc` chunks, each a
    * genuine baseline JPEG (layout per the AVI RIFF form / OpenDML).
    * MJPEG is what makes video frame decode honest in a JDK-only
    * sandbox: every coded frame is a complete JPEG, and the JDK ships a
    * JPEG codec — no stub left in the video path. */
  private[graft] def aviBytes(seed: Long, nFrames: Int, w: Int,
      h: Int): Array[Byte] = {
    val frames = (0 until nFrames)
      .map(f => jpegGray(frameLum(seed, f), w, h))
    val padded = frames.map(b =>
      if (b.length % 2 == 1) b :+ 0.toByte else b)
    val moviSize = 4 + padded.map(8 + _.length).sum
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); bb.putInt(riffSize); fcc("AVI ")
    fcc("LIST"); bb.putInt(hdrlSize); fcc("hdrl")
    fcc("avih"); bb.putInt(56)
    bb.putInt(40000) // µs/frame: 25 fps
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // maxBytesPerSec, padding, flags
    bb.putInt(nFrames); bb.putInt(0) // totalFrames, initialFrames
    bb.putInt(1) // one stream
    bb.putInt(padded.map(_.length).max + 8) // suggested buffer
    bb.putInt(w); bb.putInt(h)
    (0 until 4).foreach(_ => bb.putInt(0)) // reserved
    fcc("LIST"); bb.putInt(strlSize); fcc("strl")
    fcc("strh"); bb.putInt(56)
    fcc("vids"); fcc("MJPG")
    bb.putInt(0); bb.putInt(0) // flags, priority+language
    bb.putInt(0) // initial frames
    bb.putInt(1); bb.putInt(25) // scale, rate -> 25 fps
    bb.putInt(0); bb.putInt(nFrames) // start, length in frames
    bb.putInt(padded.map(_.length).max + 8)
    bb.putInt(-1); bb.putInt(0) // quality (default), sample size (varies)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(w.toShort); bb.putShort(h.toShort) // rcFrame
    fcc("strf"); bb.putInt(40) // BITMAPINFOHEADER
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24) // planes, bit count
    fcc("MJPG"); bb.putInt(w * h * 3)
    (0 until 4).foreach(_ => bb.putInt(0)) // xpels/ypels/clrused/clrimp
    fcc("LIST"); bb.putInt(moviSize); fcc("movi")
    frames.zip(padded).foreach { case (raw, pad) =>
      fcc("00dc"); bb.putInt(raw.length) // RIFF size excludes the pad byte
      bb.put(pad)
    }
    bb.array()
  }

  /** REAL AVI walk (no codec needed for the container): verify the RIFF
    * `AVI ` signature, pull the declared frame count from `hdrl`/`avih`,
    * and return the raw coded-frame payloads from the `movi` list
    * (`00dc`/`00db` chunks, even-byte aligned per RIFF). None for
    * malformed input — every read is bounds-checked first, so corrupt
    * payloads degrade loudly-but-safely on executors. */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
    def leInt(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def fcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + leInt(4)).toInt
    var declared = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var o = 12
    while (o + 8 <= end) {
      val id = fcc(o)
      val size = leInt(o + 4)
      if (size < 0 || o + 8 + size > end) return None
      if (id == "LIST" && size >= 4) {
        val listType = fcc(o + 8)
        var p = o + 12
        val listEnd = o + 8 + size
        while (p + 8 <= listEnd) {
          val cid = fcc(p)
          val csize = leInt(p + 4)
          if (csize < 0 || p + 8 + csize > listEnd) return None
          if (listType == "movi" && (cid == "00dc" || cid == "00db"))
            frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + csize)
          if (listType == "hdrl" && cid == "avih" && csize >= 56)
            declared = leInt(p + 8 + 16) // dwTotalFrames
          p += 8 + csize + (csize & 1) // RIFF pads chunks to even offsets
        }
      }
      o += 8 + size + (size & 1)
    }
    if (declared < 0) None else Some((declared, frames.toSeq))
  }

  /** REAL per-frame video decode: walk the AVI `movi` chunks, decode
    * each MJPEG frame with the JDK's JPEG codec, and emit one row per
    * frame with its true decoded dimensions and mean luminance — long
    * format, payloads never leave the map stage. Closes the decode gap
    * the MP4 path has to stub (ISO-BMFF coded samples need an external
    * codec; MJPEG frames don't). */
  def decodeVideoFrames(media: Dataset[MediaRow]): Dataset[VideoFrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "avi").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        parseAvi(m.bytes).toSeq.flatMap { case (_, frames) =>
          frames.zipWithIndex.flatMap { case (jpeg, idx) =>
            decodeImage(jpeg).map { case (fw, fh, mean) =>
              VideoFrameRow(m.media_id, idx, fw, fh, mean)
            }
          }
        }
      }
    }
  }

  /** Deterministic MJPEG-in-AVI corpus for the frame-decode path:
    * every video carries 3–7 real JPEG frames of md5-keyed solid
    * grays, so per-frame decoded luminance is independently
    * predictable by the verdict query and the DuckDB oracle. */
  def fakeVideos(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val w = 48 + (i % 4).toInt * 16
      val h = 32 + (i % 3).toInt * 16
      MediaRow(i, "video", aviBytes(i, 3 + (i % 5).toInt, w, h), w, h, "avi")
    }
  }

  /** Byte statistics — the fallback for corrupt payloads and the stand-
    * in for coded-frame statistics (the JDK ships no video codec). Pure
    * function of the payload — identical on any executor. */
  private[operators] def byteStats(bytes: Array[Byte]): Double = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
  }

  /** Decode stage: mapPartitions over the media rows — the per-partition
    * iterator is the batch boundary (a real video decoder would reuse a
    * native context per partition, exactly like `mapInPandas` reuses the
    * Arrow batch; ImageIO's disk cache is disabled once per partition
    * for the same reason). Image rows report REAL decoded
    * dimensions/luminance, audio rows REAL sample rate/frames/mean
    * amplitude, video rows REAL container duration/display size (frame
    * stats byte-level — no JDK codec); corrupt payloads fall back to
    * metadata dims + byte stats. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec setup
      rows.map { m =>
        val checksum = org.apache.commons.codec.digest.DigestUtils.md5Hex(m.bytes)
        val fallback = DecodedRow(m.media_id, m.kind, m.width, m.height,
          m.bytes.length.toLong, byteStats(m.bytes), checksum)
        m.kind match {
          case "image" => decodeImage(m.bytes) match {
            case Some((w, h, mean)) =>
              DecodedRow(m.media_id, m.kind, w, h, m.bytes.length.toLong,
                mean, checksum)
            case None => fallback
          }
          case "audio" => decodeAudio(m.bytes) match {
            case Some((rate, _, frames, meanAmp)) =>
              DecodedRow(m.media_id, m.kind, m.width, m.height,
                m.bytes.length.toLong, meanAmp, checksum,
                sample_rate = Some(rate), n_frames = Some(frames),
                duration_sec = Some(frames.toDouble / rate))
            case None => fallback
          }
          case "video" => parseMp4(m.bytes) match {
            // container metadata is REAL (moov/mvhd/tkhd); the frame
            // statistic stays byte-level — no codec in the JDK
            case Some((durSec, w, h)) =>
              DecodedRow(m.media_id, m.kind, w, h, m.bytes.length.toLong,
                byteStats(m.bytes), checksum, duration_sec = Some(durSec))
            case None => fallback
          }
          case _ => fallback
        }
      }
    }
  }

  /** Resize stage: metadata-level transform (stub keeps the checksum,
    * real impl would re-encode); shows the schema contract is stable
    * under derived transforms. */
  def resize(media: Dataset[MediaRow], maxDim: Int): DataFrame =
    media.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("bytes") // payload never travels past the map stage

  /** Frame sampling for video rows: one output row per sampled frame
    * (flatMap => long format, keeps downstream relational). */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, m.bytes.length / 64)
      (0 until nFrames by everyNth).map { f =>
        val frame = m.bytes.slice(f * 64, f * 64 + 64)
        FrameRow(m.media_id, f,
          org.apache.commons.codec.digest.DigestUtils.md5Hex(frame))
      }
    }
  }

  /** STUB feature extraction: a deterministic 64-dim embedding from the
    * payload (byte-histogram projection). Real plumbing: the embedding
    * column feeds [[Similarity.bruteForceTopK]] unchanged. */
  def featurize(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < m.bytes.length) {
          v(((m.bytes(i) & 0xff) * dim / 256) % dim) += 1.0f
          i += 1
        }
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
        val inv = if (norm == 0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
        MediaEmbedding(m.media_id, v)
      }
    }
  }

  /** End-to-end: media bytes → embeddings → exact top-k similar media.
    * Demonstrates the multimodal → vector-search hand-off. */
  def similarMedia(media: Dataset[MediaRow], queryIds: Seq[Long], k: Int): DataFrame = {
    val emb = featurize(media).toDF()
    Similarity.bruteForceTopK(
      emb.filter(col("media_id").isin(queryIds: _*)), emb,
      "media_id", "embedding", k)
  }
}
