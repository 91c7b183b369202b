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
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, mean_intensity: Double, checksum: String)
  final case class FrameRow(media_id: Long, frame_idx: Int,
      frame_checksum: String)
  final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

  /** Deterministic fake corpus: image rows carry REAL PNG payloads
    * (JDK codec) with md5-seeded pixels; audio/video rows carry opaque
    * md5-derived bytes. */
  def fakeMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 64 + (i % 8).toInt * 32
      val h = 64 + (i % 5).toInt * 48
      if (kind == "image") MediaRow(i, kind, pngBytes(i, w, h), w, h, "png")
      else {
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

  /** STUB audio/video decode: deterministic statistics from the raw
    * bytes (a real implementation would parse the container format
    * here). Pure function of the payload — identical on any executor. */
  private[operators] def byteStats(bytes: Array[Byte]): Double = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
  }

  /** Decode stage: mapPartitions over the media rows — the per-partition
    * iterator is the batch boundary (a real audio/video decoder would
    * reuse a native context per partition, exactly like `mapInPandas`
    * reuses the Arrow batch; ImageIO's disk cache is disabled once per
    * partition for the same reason). Image rows report REAL decoded
    * dimensions/luminance; others fall back to metadata dims + byte
    * stats. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec setup
      rows.map { m =>
        val checksum = org.apache.commons.codec.digest.DigestUtils.md5Hex(m.bytes)
        val decoded =
          if (m.kind == "image") decodeImage(m.bytes) else None
        decoded match {
          case Some((w, h, mean)) =>
            DecodedRow(m.media_id, m.kind, w, h, m.bytes.length.toLong,
              mean, checksum)
          case None =>
            DecodedRow(m.media_id, m.kind, m.width, m.height,
              m.bytes.length.toLong, byteStats(m.bytes), checksum)
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
