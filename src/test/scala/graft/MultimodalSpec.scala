package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fakeMedia(spark, 99)

  test("decode derives stats per row without shuffling payloads") {
    val out = Multimodal.decode(media)
    assert(out.count() === 99)
    // id 0 is an image: REAL PNG decode — dims from the actual pixels
    val img = out.filter($"media_id" === 0).head()
    assert(img.width === 64 && img.height === 64)
    assert(img.mean_intensity > 0 && img.mean_intensity < 255)
    assert(img.checksum.matches("[0-9a-f]{32}"))
    // id 1 is audio: declared byte-stats stub on the opaque payload
    val aud = out.filter($"media_id" === 1).head()
    assert(aud.n_bytes === 256 + 16)
    assert(aud.mean_intensity > 0 && aud.mean_intensity < 255)
    // determinism: same id => same checksum on re-run
    val again = Multimodal.decode(media).filter($"media_id" === 0).head()
    assert(again.checksum === img.checksum)
  }

  test("image decode is real: dimensions and luminance come from the PNG") {
    // metadata lies (999×888); the decoder must report the true 40×25
    val png = Multimodal.pngBytes(7L, 40, 25)
    val lied = Seq(Multimodal.MediaRow(123L, "image", png, 999, 888, "png")).toDS()
    val out = Multimodal.decode(lied).head()
    assert(out.width === 40 && out.height === 25)
    // luminance must match an independent per-pixel recomputation
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val lum = (for (y <- 0 until 25; x <- 0 until 40) yield {
      val rgb = img.getRGB(x, y)
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    }).sum / (40 * 25)
    assert(math.abs(out.mean_intensity - lum) < 1e-9)
    // a corrupt payload on an image row falls back to the stub, not a
    // crash — both the no-recognizable-magic case (ImageIO.read returns
    // null) and the valid-magic-truncated-body case (ImageIO.read THROWS)
    val noMagic = Seq(Multimodal.MediaRow(124L, "image",
      Array.fill[Byte](32)(7), 8, 8, "png")).toDS()
    val b = Multimodal.decode(noMagic).head()
    assert(b.width === 8 && b.height === 8 && b.n_bytes === 32)
    val truncated = Seq(Multimodal.MediaRow(125L, "image",
      png.take(50), 9, 9, "png")).toDS()
    val tr = Multimodal.decode(truncated).head()
    assert(tr.width === 9 && tr.height === 9 && tr.n_bytes === 50)
  }

  test("resize clamps the longest edge and drops payload bytes") {
    val out = Multimodal.resize(media, maxDim = 100)
    assert(!out.columns.contains("bytes"))
    val bad = out.filter(greatest($"out_width", $"out_height") > 100).count()
    assert(bad === 0)
    // never upscale
    assert(out.filter($"scale" > 1.0).count() === 0)
  }

  test("frame sampling emits long-format rows for video only") {
    val frames = Multimodal.sampleFrames(media, everyNth = 4)
    val kinds = frames.join(media.toDF(), "media_id")
      .select("kind").distinct().as[String].collect()
    assert(kinds === Array("video"))
    assert(frames.count() > media.filter(_.kind == "video").count(),
      "multiple frames per video")
  }

  test("featurize produces unit vectors feeding similarity search") {
    val emb = Multimodal.featurize(media)
    val norms = emb.map { e =>
      math.sqrt(e.embedding.map(x => x.toDouble * x).sum)
    }.collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))

    val topk = Multimodal.similarMedia(media, queryIds = Seq(0L, 1L), k = 3)
    val rows = topk.collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Double]("sim") <= 1.000001))
  }
}
