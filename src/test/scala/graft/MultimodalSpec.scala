package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fakeMedia(spark, 99)

  test("decode derives stats per row without shuffling payloads") {
    val out = Multimodal.decode(media)
    assert(out.count() === 99)
    val r = out.filter($"media_id" === 0).head()
    assert(r.n_bytes === 256)
    assert(r.mean_intensity > 0 && r.mean_intensity < 255)
    assert(r.checksum.matches("[0-9a-f]{32}"))
    // determinism: same id => same checksum on re-run
    val again = Multimodal.decode(media).filter($"media_id" === 0).head()
    assert(again.checksum === r.checksum)
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
