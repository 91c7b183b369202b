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
  * pixels, not metadata. AUDIO/VIDEO DECODE IS STUBBED (no such codecs
  * in the JDK or this container): those rows fall back to declared
  * deterministic byte statistics. Everything around the codec — the
  * schema contract, the `mapPartitions` batch shape (one JVM-side
  * batch per partition, the Scala analogue of `mapInPandas`),
  * partitioning, and the embedding hand-off into [[Similarity]] — is
  * identical for both paths, so a real audio/video codec is a
  * one-function swap.
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
    * video rows carry opaque md5-derived bytes (no container codec in
    * the JDK). */
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
          val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"media|$i")
          val bytes = Iterator.continually(digest).flatten
            .take(256 + (i % 64).toInt * 16).toArray
          MediaRow(i, kind, bytes, w, h, "fake")
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

  /** STUB video decode: deterministic statistics from the raw bytes (a
    * real implementation would parse the container format here). Pure
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
    * amplitude; video (and corrupt payloads) fall back to metadata dims
    * + byte stats. */
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
