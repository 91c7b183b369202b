package graft.operators

import graft.functions.VectorExpressions.dotF
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.4 extension surface):
  * image/audio/video as opaque `binary` columns with typed metadata,
  * and decode / feature-extract / resize / frame-sample as distributed
  * per-partition stages.
  *
  * The DECODE STEP IS STUBBED: this container has no image/audio codecs,
  * so `decodeBytes` derives deterministic fake pixel statistics from the
  * payload bytes. Everything around it — the schema contract, the
  * `mapPartitions` batch shape (one JVM-side batch per partition, the
  * Scala analogue of `mapInPandas`), partitioning, and the embedding
  * hand-off into [[Similarity]] — is real and tested, so swapping in a
  * real codec is a one-function change.
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

  /** Deterministic fake corpus: payload bytes derived from md5(id). */
  def fakeMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val digest = org.apache.commons.codec.digest.DigestUtils.md5(s"media|$i")
      val bytes = Iterator.continually(digest).flatten.take(256 + (i % 64).toInt * 16).toArray
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      MediaRow(i, kind, bytes, 64 + (i % 8).toInt * 32, 64 + (i % 5).toInt * 48, "fake")
    }
  }

  /** STUB decode: deterministic statistics from the raw bytes (a real
    * implementation would parse the container format here). Pure
    * function of the payload — identical on any executor. */
  private[operators] def decodeBytes(bytes: Array[Byte]): (Double, String) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    (mean, org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes))
  }

  /** Decode stage: mapPartitions over the media rows — the per-partition
    * iterator is the batch boundary (where a real decoder would reuse a
    * native context per partition, exactly like `mapInPandas` reuses the
    * Arrow batch). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would initialize a codec context here
      rows.map { m =>
        val (mean, sum) = decodeBytes(m.bytes)
        DecodedRow(m.media_id, m.kind, m.width, m.height,
          m.bytes.length.toLong, mean, sum)
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
