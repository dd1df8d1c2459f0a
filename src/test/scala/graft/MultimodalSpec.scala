package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(
    spark, spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet"))

  test("assetsFromDocuments produces the binary+metadata schema") {
    val s = assets.schema
    assert(s("bytes").dataType.typeName === "binary")
    assert(assets.count() > 0)
    val kinds = assets.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("extractFeatures: deterministic fixed-width vectors, byte counts real") {
    val f1 = Multimodal.extractFeatures(assets, dims = 16).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, dims = 16).collect().sortBy(_.asset_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("decodeStub differs across payloads, stable per payload") {
    val a = Multimodal.decodeStub("abc".getBytes, 8).toSeq
    assert(a === Multimodal.decodeStub("abc".getBytes, 8).toSeq)
    assert(a !== Multimodal.decodeStub("abd".getBytes, 8).toSeq)
  }

  test("sampleFrames emits duration/step frames for videos only") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    val byAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    val videos = assets.filter(_.kind == "video").collect()
    assert(videos.forall(v => byAsset.get(v.asset_id).contains(v.duration_ms / 1000)))
    val nonVideo = assets.filter(_.kind != "video").map(_.asset_id).collect().toSet
    assert(byAsset.keySet.intersect(nonVideo).isEmpty)
  }

  test("resize rewrites image metadata only") {
    val out = Multimodal.resize(assets, 224, 224)
    assert(out.filter(a => a.kind == "image" && a.width != 224).count() === 0)
    assert(out.filter(a => a.kind == "video" && a.width == 224).count() === 0)
  }

  // 4×2 PNG, left half pure red, right half pure blue — every feature is
  // hand-computable: meanR = meanB = 0.5, meanG = 0,
  // meanLuma = 0.5·(0.299 + 0.114), and with 4 luma-histogram bins the
  // blue half (luma 0.114) lands in bin 0 and the red half (0.299·4 =
  // 1.196) in bin 1.
  private def redBluePng: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: pixel features match hand-computed values") {
    val feats = Multimodal.decodeImage(redBluePng)
      .map(Multimodal.imageFeatures(_, 8))
      .getOrElse(fail("generated PNG did not decode"))
    assert(math.abs(feats(0) - 0.5) < 1e-6, "mean R")
    assert(feats(1) === 0.0f, "mean G")
    assert(math.abs(feats(2) - 0.5) < 1e-6, "mean B")
    assert(math.abs(feats(3) - 0.5 * (0.299 + 0.114)) < 1e-6, "mean luma")
    assert(math.abs(feats(4) - 0.5) < 1e-6, "luma hist bin 0 = blue half")
    assert(math.abs(feats(5) - 0.5) < 1e-6, "luma hist bin 1 = red half")
    assert(feats(6) === 0.0f && feats(7) === 0.0f, "upper luma bins empty")
  }

  test("extractFeatures: real pixels for decodable images, stub for the rest") {
    val png = redBluePng
    val ds = Seq(
      Multimodal.Asset(1L, "image", png, 4, 2, 0L),
      Multimodal.Asset(2L, "image", "not an image".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val out = Multimodal.extractFeatures(ds, dims = 8).collect().sortBy(_.asset_id)
    val real = Multimodal.decodeImage(png).map(Multimodal.imageFeatures(_, 8)).get
    assert(out(0).features.toSeq === real.toSeq)
    assert(out(1).features.toSeq ===
      Multimodal.decodeStub("not an image".getBytes("UTF-8"), 8).toSeq)
  }

  test("real WAV decode: synthesized PCM16 round-trips to exact sample facts") {
    val wav = Multimodal.synthWav(seed = 7L, durationMs = 400L) // 4 kHz default
    val (samples, rate) = Multimodal.decodeWav(wav)
      .getOrElse(fail("generated WAV did not decode"))
    assert(rate === 4000.0f)
    assert(samples.length === 1600, "400 ms at 4 kHz")
    // 8 samples/cycle sine: mean square exactly amp²/2 up to int16 rounding
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
    assert(math.abs(rms - Multimodal.ampFor(7L) / math.sqrt(2.0)) < 1e-3)
    assert(Multimodal.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty, "truncated header rejected")
  }

  test("extractFeatures: real signal features for decodable audio, stub for the rest") {
    val wav = Multimodal.synthWav(seed = 3L, durationMs = 200L)
    val ds = Seq(
      Multimodal.Asset(1L, "audio", wav, 0, 0, 200L),
      Multimodal.Asset(2L, "audio", "not audio".getBytes("UTF-8"), 0, 0, 200L)).toDS()
    val out = Multimodal.extractFeatures(ds, dims = 8).collect().sortBy(_.asset_id)
    val amp = Multimodal.ampFor(3L)
    assert(math.abs(out(0).features(0) - amp / math.sqrt(2.0)) < 1e-3, "rms")
    assert(math.abs(out(0).features(1) - amp) < 1e-3, "peak")
    // constant-envelope sine: every energy window carries the global RMS
    (4 until 8).foreach(i =>
      assert(math.abs(out(0).features(i) - out(0).features(0)) < 1e-2, s"envelope $i"))
    assert(out(1).features.toSeq ===
      Multimodal.decodeStub("not audio".getBytes("UTF-8"), 8).toSeq)
  }

  test("decodeAudioInfo measures rate, count, duration, rms; flags undecodable") {
    val ds = Seq(
      Multimodal.Asset(10L, "audio", Multimodal.synthWav(10L, 600L), 0, 0, 600L),
      Multimodal.Asset(11L, "audio", Array[Byte](1, 2, 3), 0, 0, 0L)).toDS()
    val out = Multimodal.decodeAudioInfo(ds).collect().sortBy(_.asset_id)
    assert(out(0).decoded && out(0).sample_rate === 4000 &&
      out(0).n_samples === 2400L && out(0).duration_ms_decoded === 600L)
    assert(math.abs(out(0).rms - Multimodal.ampFor(10L) / math.sqrt(2.0)) < 1e-3)
    assert(!out(1).decoded && out(1).n_samples === 0L)
  }

  test("real AVI decode: synthesized MJPEG container round-trips exactly") {
    val avi = Multimodal.synthAvi(seed = 5L, durationMs = 3000L, fps = 2)
    val v = Multimodal.decodeAvi(avi).getOrElse(fail("generated AVI did not decode"))
    assert(v.frames.length === 6, "3 s at 2 fps")
    assert(v.microSecPerFrame === 500000)
    assert(v.width === 16 && v.height === 16)
    // every frame is a decodable JPEG whose mean gray matches the seeded
    // synthesis level up to DC quantization
    v.frames.zipWithIndex.foreach { case (f, i) =>
      val img = Multimodal.decodeImage(f).getOrElse(fail(s"frame $i not a JPEG"))
      val luma = Multimodal.imageFeatures(img, 4)(3)
      val expected = Multimodal.frameGray(5L, i) / 255.0
      assert(math.abs(luma - expected) < 0.02, s"frame $i luma $luma vs $expected")
    }
    assert(Multimodal.decodeAvi("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAvi(avi.take(40)).isEmpty, "truncated container rejected")
    // a negative declared chunk size must abort the walk (None), not spin
    // the position backwards forever — corrupt the first movi-list frame
    // chunk's size field in a real container and require prompt rejection
    val corrupt = avi.clone()
    val dcIdx = {
      def find(pat: Array[Byte]): Int =
        corrupt.indices.indexWhere(i => i + pat.length <= corrupt.length &&
          pat.indices.forall(j => corrupt(i + j) == pat(j)))
      find("00dc".getBytes("US-ASCII"))
    }
    assert(dcIdx > 0, "fixture must contain a frame chunk")
    corrupt(dcIdx + 7) = 0x80.toByte // little-endian size → negative Int
    val t0 = System.nanoTime()
    assert(Multimodal.decodeAvi(corrupt).isEmpty, "negative chunk size rejected")
    assert((System.nanoTime() - t0) < 2e9, "rejection must not hang")
  }

  test("sampleFrames seeks real frames: 2 fps container sampled at 1 s ticks") {
    val seed = 9L
    val ds = Seq(
      Multimodal.Asset(seed, "video", Multimodal.synthAvi(seed, 4000L, fps = 2),
        16, 16, 4000L)).toDS()
    val out = Multimodal.sampleFrames(ds, everyMs = 1000L).collect().sortBy(_.frame_idx)
    assert(out.length === 4)
    out.foreach { f =>
      // tick i must land on SOURCE frame 2i — the luma proves the seek
      val img = Multimodal.decodeImage(f.frame_bytes)
        .getOrElse(fail(s"sampled frame ${f.frame_idx} not decodable"))
      val luma = Multimodal.imageFeatures(img, 4)(3)
      val expected = Multimodal.frameGray(seed, 2 * f.frame_idx) / 255.0
      assert(math.abs(luma - expected) < 0.02, s"tick ${f.frame_idx}")
    }
  }

  test("frameStats measures decoded pixels and flags undecodable frames") {
    val frames = Seq(
      Multimodal.AssetFrames(1L, 0, Multimodal.synthJpeg(100)),
      Multimodal.AssetFrames(1L, 1, "garbage".getBytes("UTF-8"))).toDS()
    val out = Multimodal.frameStats(frames).collect().sortBy(_.frame_idx)
    assert(out(0).decoded && math.abs(out(0).mean_luma - 100.0 / 255.0) < 0.02)
    assert(!out(1).decoded && out(1).mean_luma === 0.0)
  }

  test("dHash: brightness-invariant, perturbation-bounded, base-separating") {
    def hashOf(bytes: Array[Byte]): Long =
      Multimodal.dHash(Multimodal.decodeImage(bytes).getOrElse(fail("png did not decode")))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = hashOf(Multimodal.synthPng(7L, perturb = false))
    // planted twin: one block shifted → at most the 2 adjacent comparisons move
    val twin = hashOf(Multimodal.synthPng(7L, perturb = true))
    assert(ham(base, twin) <= 2, s"planted twin drifted ${ham(base, twin)} bits")
    // a different base must be far away (independent sign pattern)
    val other = hashOf(Multimodal.synthPng(8L, perturb = false))
    assert(ham(base, other) > 10, s"bases only ${ham(base, other)} bits apart")
    // deterministic
    assert(base === hashOf(Multimodal.synthPng(7L, perturb = false)))
  }

  test("imageHashes + hammingPairs recover exactly the planted image twins") {
    val ds = (0L until 12L).map(id =>
      Multimodal.Asset(id, "image", Multimodal.synthPng(id / 2, perturb = id % 2 == 1),
        36, 32, 0L)).toDS()
    val hashes = Multimodal.imageHashes(ds)
    assert(hashes.where($"decoded").count() === 12)
    val pairs = graft.operators.Dedup.hammingPairs(hashes, "asset_id", "phash",
        maxDist = 3, bands = 4)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 6L).map(k => (2 * k, 2 * k + 1)).toSet)
  }

  test("audioFingerprint: gain-invariant envelope hash, twin-bounded, base-separating") {
    def hashOf(bytes: Array[Byte]): Long = {
      val (samples, _) = Multimodal.decodeWav(bytes).getOrElse(fail("wav did not decode"))
      Multimodal.audioFingerprint(samples)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = hashOf(Multimodal.synthWavPattern(11L, perturb = false))
    val twin = hashOf(Multimodal.synthWavPattern(11L, perturb = true))
    assert(ham(base, twin) <= 2, s"planted twin drifted ${ham(base, twin)} bits")
    val other = hashOf(Multimodal.synthWavPattern(12L, perturb = false))
    assert(ham(base, other) > 10, s"bases only ${ham(base, other)} bits apart")
    assert(base === hashOf(Multimodal.synthWavPattern(11L, perturb = false)))
  }

  test("audioHashes + hammingPairs recover exactly the planted audio twins") {
    val ds = (0L until 10L).map(id =>
      Multimodal.Asset(id, "audio",
        Multimodal.synthWavPattern(id / 2, perturb = id % 2 == 1), 0, 0, 1625L)).toDS()
    val hashes = Multimodal.audioHashes(ds)
    assert(hashes.where($"decoded").count() === 10)
    val pairs = graft.operators.Dedup.hammingPairs(hashes, "asset_id", "ahash",
        maxDist = 3, bands = 4)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 5L).map(k => (2 * k, 2 * k + 1)).toSet)
  }

  test("videoFingerprint: temporal luma hash, twin-bounded, base-separating") {
    def hashOf(bytes: Array[Byte]): Long =
      Multimodal.videoFingerprint(
        Multimodal.decodeAvi(bytes).getOrElse(fail("avi did not decode")))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = hashOf(Multimodal.synthAviPattern(11L, perturb = false))
    val twin = hashOf(Multimodal.synthAviPattern(11L, perturb = true))
    // one perturbed frame moves only its two adjacent luma comparisons
    assert(ham(base, twin) <= 2, s"planted twin drifted ${ham(base, twin)} bits")
    val other = hashOf(Multimodal.synthAviPattern(12L, perturb = false))
    assert(ham(base, other) > 10, s"bases only ${ham(base, other)} bits apart")
    assert(base === hashOf(Multimodal.synthAviPattern(11L, perturb = false)))
  }

  test("videoHashes + hammingPairs recover exactly the planted video twins") {
    val ds = (0L until 10L).map(id =>
      Multimodal.Asset(id, "video",
        Multimodal.synthAviPattern(id / 2, perturb = id % 2 == 1), 8, 8, 13000L)).toDS()
    val hashes = Multimodal.videoHashes(ds)
    assert(hashes.where($"decoded").count() === 10)
    val pairs = graft.operators.Dedup.hammingPairs(hashes, "asset_id", "vhash",
        maxDist = 3, bands = 4)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 5L).map(k => (2 * k, 2 * k + 1)).toSet)
  }

  test("resize really rescales decodable images and re-encodes") {
    val ds = Seq(Multimodal.Asset(1L, "image", redBluePng, 4, 2, 0L)).toDS()
    val out = Multimodal.resize(ds, 2, 2).collect().head
    assert(out.width === 2 && out.height === 2)
    val img = Multimodal.decodeImage(out.bytes)
      .getOrElse(fail("resized payload did not decode"))
    assert(img.getWidth === 2 && img.getHeight === 2)
    // area-averaged halves keep their dominant channel
    val left = img.getRGB(0, 0)
    val right = img.getRGB(1, 0)
    assert(((left >> 16) & 0xFF) > ((left) & 0xFF), "left stays red-dominant")
    assert((right & 0xFF) > ((right >> 16) & 0xFF), "right stays blue-dominant")
  }
}
