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
    // id 1 is audio: REAL WAV decode — stream properties from frames
    val aud = out.filter($"media_id" === 1).head()
    assert(aud.sample_rate === Some(8000))
    assert(aud.n_frames === Some(400 + 50L)) // 400 + (1 % 64) * 50 samples
    assert(aud.duration_sec.exists(d => math.abs(d - 450.0 / 8000) < 1e-9))
    assert(aud.mean_intensity > 0 && aud.mean_intensity < 255)
    // id 2 is video: REAL container parse — duration from mvhd,
    // display size from tkhd (16.16 fixed), not from row metadata
    val vid = out.filter($"media_id" === 2).head()
    assert(vid.duration_sec.exists(d =>
      math.abs(d - (1000 + 2 % 60 * 250) / 1000.0) < 1e-9))
    assert(vid.width === 64 + 2 % 8 * 32 && vid.height === 64 + 2 % 5 * 48)
    assert(vid.sample_rate.isEmpty)
    // image rows carry no audio stream properties
    assert(img.sample_rate.isEmpty && img.n_frames.isEmpty)
    // determinism: same id => same checksum on re-run
    val again = Multimodal.decode(media).filter($"media_id" === 0).head()
    assert(again.checksum === img.checksum)
  }

  test("mp4 container parse is real and corrupt payloads degrade, not throw") {
    // round-trip: parse what the builder wrote
    val b = Multimodal.mp4Bytes(7, durationMs = 4250, w = 320, h = 240)
    assert(Multimodal.parseMp4(b) === Some((4.25, 320, 240)))
    // magic is genuine ISO-BMFF: 'ftyp' at offset 4
    assert(new String(b.slice(4, 8), "US-ASCII") === "ftyp")
    // corrupt: truncated mid-moov, garbage, empty — all None, no throw
    assert(Multimodal.parseMp4(b.take(40)).isEmpty)
    assert(Multimodal.parseMp4(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
    // zero-size box loop guard: size field of 0 must not hang
    val loop = b.clone(); loop(0) = 0; loop(1) = 0; loop(2) = 0; loop(3) = 0
    assert(Multimodal.parseMp4(loop).isEmpty)
  }

  test("audio decode is real: rate, frames and amplitude come from the WAV") {
    // metadata lies; the decoder must report the true stream properties
    val wav = Multimodal.wavBytes(7L, nSamples = 1234, sampleRate = 16000)
    val lied = Seq(Multimodal.MediaRow(200L, "audio", wav, 999, 888, "wav")).toDS()
    val out = Multimodal.decode(lied).head()
    assert(out.sample_rate === Some(16000))
    assert(out.n_frames === Some(1234L))
    assert(out.duration_sec.exists(d => math.abs(d - 1234.0 / 16000) < 1e-9))
    // mean |amplitude| of a sine of amplitude A is 2A/π: recompute the
    // seed-derived A independently and pin the decoded mean against it
    val digest = org.apache.commons.codec.digest.DigestUtils.md5("media|7")
    val amp = 0.25 + (digest(1) & 0xff) / 1024.0
    val expected = 2.0 * amp / math.Pi * 255.0
    assert(math.abs(out.mean_intensity - expected) / expected < 0.02,
      s"decoded mean ${out.mean_intensity} vs sine mean $expected")
    // a corrupt payload falls back to byte stats, not a crash
    val corrupt = Seq(Multimodal.MediaRow(201L, "audio",
      Array.fill[Byte](64)(3), 8, 8, "wav")).toDS()
    val c = Multimodal.decode(corrupt).head()
    assert(c.sample_rate.isEmpty && c.n_bytes === 64)
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

  test("AVI frame decode is real: per-frame pixels match the generator") {
    val vids = Multimodal.fakeVideos(spark, 12)
    val frames = Multimodal.decodeVideoFrames(vids).collect()
    // every generated frame decodes: Σ over ids of (3 + id % 5)
    val expectedCount = (0 until 12).map(i => 3 + i % 5).sum
    assert(frames.length === expectedCount)
    for (f <- frames) {
      val i = f.media_id
      assert(f.frame_w === 48 + (i % 4).toInt * 16)
      assert(f.frame_h === 32 + (i % 3).toInt * 16)
      // solid-gray MJPEG frame: decoded mean luminance ≈ encoded value
      // (JPEG DC quantization moves it by at most ~1 code value)
      val enc = Multimodal.frameLum(i, f.frame_idx)
      assert(math.abs(f.mean_lum - enc) <= 2.0,
        s"media $i frame ${f.frame_idx}: decoded ${f.mean_lum} vs encoded $enc")
    }
  }

  test("MP4 frame decode is real: sample tables resolve, pixels match the generator") {
    val vids = Multimodal.fakeMp4Videos(spark, 12)
    val frames = Multimodal.decodeMp4Frames(vids).collect()
    val expectedCount = (0 until 12).map(i => 2 + i % 6).sum
    assert(frames.length === expectedCount)
    for (f <- frames) {
      val i = f.media_id
      assert(f.frame_w === 40 + (i % 5).toInt * 8)
      assert(f.frame_h === 24 + (i % 4).toInt * 8)
      val enc = Multimodal.frameLum(i, f.frame_idx)
      assert(math.abs(f.mean_lum - enc) <= 2.0,
        s"media $i frame ${f.frame_idx}: decoded ${f.mean_lum} vs encoded $enc")
    }
    // the container is ALSO a valid plain MP4 for the metadata path
    val meta = Multimodal.parseMp4(Multimodal.mp4MjpegBytes(3L, 5, 40, 24))
    assert(meta.contains((0.2, 40, 24))) // 5 frames at 25 fps
  }

  test("MP4 sample-table parse rejects malformed containers instead of throwing") {
    assert(Multimodal.parseMp4Frames(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMp4Frames("ftypisomnotvalid".getBytes).isEmpty)
    val good = Multimodal.mp4MjpegBytes(7L, 4, 48, 32)
    assert(Multimodal.parseMp4Frames(good).exists(_._2.size == 4))
    // truncation anywhere must degrade to None, never throw
    for (cut <- Seq(10, good.length / 4, good.length / 2, good.length - 5)) {
      val t = java.util.Arrays.copyOfRange(good, 0, cut)
      val r = Multimodal.parseMp4Frames(t)
      assert(r.isEmpty || r.exists(_._2.forall(_.nonEmpty)))
    }
    // corrupt stco offset (points past EOF) must be caught by bounds
    val evil = good.clone()
    // find stco box and break its offset
    val idx = {
      var i = 0; var found = -1
      while (found < 0 && i + 4 <= evil.length) {
        if (evil(i) == 's' && evil(i + 1) == 't' && evil(i + 2) == 'c' &&
          evil(i + 3) == 'o') found = i
        i += 1
      }
      found
    }
    assert(idx > 0)
    evil(idx + 12) = 0x7f.toByte // absurd chunk offset high byte
    assert(Multimodal.parseMp4Frames(evil).isEmpty)
  }

  test("AVI parse rejects malformed containers instead of throwing") {
    assert(Multimodal.parseAvi(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    val good = Multimodal.aviBytes(7L, 4, 64, 48)
    assert(Multimodal.parseAvi(good).exists(_._2.length == 4))
    // truncate mid-movi: bounds check refuses rather than slicing air
    assert(Multimodal.parseAvi(good.take(good.length / 2)).isEmpty)
    // declared frame count comes from avih
    assert(Multimodal.parseAvi(good).exists(_._1 == 4))
  }

  test("aHash64: exact brightness invariance and engineered block distances") {
    val rows = Multimodal.fakeNearDupImages(spark, 8).collect()
      .map(r => r.media_id -> Multimodal.aHash64(r.bytes)).toMap
    for (g <- 0 until 8) {
      val (h0, h1, h2) = (rows(3L * g), rows(3L * g + 1), rows(3L * g + 2))
      assert(h0 === h1, s"group $g: +8 brightness must not move the hash")
      assert(java.lang.Long.bitCount(h0 ^ h2) === 2,
        s"group $g: two inverted blocks must flip exactly two bits")
    }
  }

  test("aHash64: cross-group hashes are far apart (banding cannot false-pair)") {
    val hs = Multimodal.fakeNearDupImages(spark, 60).collect()
      .filter(_.media_id % 3 == 0).map(r => Multimodal.aHash64(r.bytes))
    val minDist = (for (i <- hs.indices; j <- hs.indices if i < j)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minDist > 3,
      s"fixed corpus must keep unrelated images beyond the pair threshold: $minDist")
  }

  test("audioHash64: exact gain invariance and engineered window distances") {
    val rows = Multimodal.fakeNearDupAudio(spark, 8).collect()
      .map(r => r.media_id -> Multimodal.audioHash64(r.bytes)).toMap
    for (g <- 0 until 8) {
      val (h0, h1, h2) = (rows(3L * g), rows(3L * g + 1), rows(3L * g + 2))
      assert(h0 === h1, s"group $g: exact x2 gain must not move the fingerprint")
      assert(java.lang.Long.bitCount(h0 ^ h2) === 2,
        s"group $g: two swapped windows must flip exactly two bits")
    }
  }

  test("audioHash64: cross-group fingerprints stay beyond the pair threshold") {
    val hs = Multimodal.fakeNearDupAudio(spark, 60).collect()
      .filter(_.media_id % 3 == 0).map(r => Multimodal.audioHash64(r.bytes))
    val minDist = (for (i <- hs.indices; j <- hs.indices if i < j)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minDist > 3, s"unrelated audio too close: $minDist")
  }

  test("aHash64 survives a PNG re-encode round-trip") {
    val r = Multimodal.fakeNearDupImages(spark, 1).collect().head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(Multimodal.aHash64(out.toByteArray) === Multimodal.aHash64(r.bytes))
  }
}
