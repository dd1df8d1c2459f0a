package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side contract is real and tested: schema, partition-parallel
  * batch processing (`mapPartitions` over typed rows — the Scala analog of
  * a Pandas-UDF `mapInPandas` batch), deterministic output shapes.
  *
  * IMAGE decoding is REAL: `decodeImage` reads PNG/BMP/GIF/JPEG through
  * pure-JDK `javax.imageio` (no container codecs needed) and
  * `imageFeatures` computes mean-channel + luma-histogram features from
  * actual pixels; `resize` rescales decodable images and re-encodes PNG.
  * AUDIO decoding is REAL for WAV/PCM: `decodeWav` reads RIFF containers
  * through pure-JDK `javax.sound.sampled` (converting any
  * AudioSystem-supported encoding to PCM16 first), and `audioFeatures`
  * computes RMS/peak/zero-crossing/energy-envelope features from actual
  * samples. VIDEO decoding is REAL for MJPEG-in-AVI: `decodeAvi` walks the
  * RIFF container (avih header + movi frame chunks) and each frame decodes
  * through `decodeImage` — `sampleFrames` seeks to real frame payloads and
  * `frameStats` measures their pixels. Payloads none of the three stacks
  * can parse fall back to `decodeStub`, a deterministic fake that keeps
  * the batch shape testable end-to-end; a real deployment swaps the stub
  * for a wider codec inside the same partition iterator.
  *
  * Scale notes: each asset is processed exactly once inside its partition —
  * no shuffle, no driver traffic; heavy per-row work parallelizes with the
  * scan. Keep asset batches in partition-sized chunks by sizing
  * `spark.sql.files.maxPartitionBytes` to the media row size, and store
  * bytes in parquet (or point to object storage and fetch inside the
  * iterator for >100 MB assets).
  */
object Multimodal {

  /** One media asset row: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,            // pixels (0 when not applicable)
      height: Int,
      duration_ms: Long)     // audio/video length (0 for images)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  final case class AssetFrames(
      asset_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Deterministic fake "decode": a feature vector derived from a rolling
    * hash of the payload. STUB — replace the body with a real codec
    * (image decode → CNN features, audio → spectrogram, ...) in deployment;
    * the signature and batch shape are the contract.
    */
  def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Pure-JDK image decode: PNG/BMP/GIF/JPEG via `javax.imageio`. None for
    * anything ImageIO can't parse (including non-image payloads). The
    * in-memory stream keeps executors off ImageIO's tmp-file cache.
    */
  /** `ImageIO.read` walks the plugin registry and instantiates a fresh
    * reader per call — measurable when a video query decodes tens of JPEG
    * frames per asset. JPEG payloads (SOI-sniffed) reuse one reader per
    * executor thread instead; everything else keeps the generic path.
    * ImageReader is not thread-safe, hence the ThreadLocal; a reader that
    * throws is dropped (next call builds a fresh one) so no corrupted
    * state survives a bad payload.
    */
  private val jpegReaderTl: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next())

  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      if (bytes.length > 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) {
        val reader = jpegReaderTl.get()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true)
          Option(reader.read(0))
        } finally iis.close()
      } else
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    } catch { case scala.util.control.NonFatal(_) => jpegReaderTl.remove(); None }

  /** Real pixel features from a decoded image:
    * [meanR, meanG, meanB, meanLuma, luma histogram over dims-4 bins...],
    * every component in [0,1]. Deterministic in the pixel data.
    */
  def imageFeatures(img: java.awt.image.BufferedImage, dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    val w = img.getWidth
    val h = img.getHeight
    val n = (w.toLong * h).toDouble
    val histBins = math.max(dims - 4, 0)
    val hist = new Array[Double](math.max(histBins, 1))
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        sr += r; sg += g; sb += b
        if (histBins > 0) {
          val luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          val bin = math.min((luma * histBins).toInt, histBins - 1)
          hist(bin) += 1
        }
        x += 1
      }
      y += 1
    }
    if (dims > 0) out(0) = (sr / n / 255.0).toFloat
    if (dims > 1) out(1) = (sg / n / 255.0).toFloat
    if (dims > 2) out(2) = (sb / n / 255.0).toFloat
    if (dims > 3) out(3) = ((0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0).toFloat
    var i = 0
    while (i < histBins) { out(4 + i) = (hist(i) / n).toFloat; i += 1 }
    out
  }

  /** Pure-JDK audio decode: WAV/RIFF (and anything AudioSystem can convert
    * to PCM_SIGNED 16-bit) via `javax.sound.sampled`. Returns mono-folded
    * samples in [-1, 1] plus the sample rate; None for anything the audio
    * stack can't parse (including non-audio payloads).
    */
  def decodeWav(bytes: Array[Byte]): Option[(Array[Float], Float)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
          fmt.getSampleRate, false)
        val converted =
          if (fmt.matches(pcm)) ais
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, ais)
        val raw = converted.readAllBytes()
        val ch = pcm.getChannels
        val nFrames = raw.length / (2 * ch)
        val out = new Array[Float](nFrames)
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < nFrames) {
          var s = 0.0f
          var c = 0
          while (c < ch) { s += bb.getShort() / 32768.0f; c += 1 }
          out(i) = s / ch
          i += 1
        }
        Some((out, fmt.getSampleRate))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real signal features from decoded audio samples:
    * [rms, peak, zero-crossing rate, capped duration] + an RMS energy
    * envelope over dims-4 equal windows — every component in [0, 1],
    * deterministic in the sample data. The audio analog of
    * `imageFeatures`' mean-channel + luma histogram.
    */
  def audioFeatures(samples: Array[Float], sampleRate: Float, dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    val n = samples.length
    if (n == 0) return out
    var sumSq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = samples(i).toDouble
      sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && (v > 0) != (samples(i - 1) > 0)) zc += 1
      i += 1
    }
    if (dims > 0) out(0) = math.sqrt(sumSq / n).toFloat
    if (dims > 1) out(1) = peak.toFloat
    if (dims > 2) out(2) = (zc.toDouble / n).toFloat
    if (dims > 3) out(3) = math.min(n / sampleRate / 60.0, 1.0).toFloat
    val windows = math.max(dims - 4, 0)
    var w = 0
    while (w < windows) {
      val lo = (w.toLong * n / windows).toInt
      val hi = ((w + 1).toLong * n / windows).toInt
      var s = 0.0
      var j = lo
      while (j < hi) { s += samples(j).toDouble * samples(j); j += 1 }
      out(4 + w) = (if (hi > lo) math.sqrt(s / (hi - lo)) else 0.0).toFloat
      w += 1
    }
    out
  }

  /** Feature extraction over a partition-parallel batch iterator: real
    * pixel features for decodable images, real signal features for
    * decodable audio, deterministic stub otherwise.
    */
  def extractFeatures(assets: Dataset[Asset], dims: Int = 64): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup happens once (codec init in a real deployment)
      it.map { a =>
        val feats = a.kind match {
          case "image" =>
            decodeImage(a.bytes).map(imageFeatures(_, dims)).getOrElse(decodeStub(a.bytes, dims))
          case "audio" =>
            decodeWav(a.bytes).map { case (s, r) => audioFeatures(s, r, dims) }
              .getOrElse(decodeStub(a.bytes, dims))
          case "video" =>
            decodeAvi(a.bytes)
              .flatMap(v => decodeImage(v.frames(v.frames.length / 2)))
              .map(imageFeatures(_, dims))
              .getOrElse(decodeStub(a.bytes, dims))
          case _ => decodeStub(a.bytes, dims)
        }
        AssetFeatures(a.asset_id, a.kind, a.bytes.length.toLong, feats)
      }
    }
  }

  // ------------------------------------------------- real MJPEG-in-AVI video

  /** A decoded AVI: per-frame payloads (each an ImageIO-decodable image,
    * JPEG for MJPEG streams) plus the header facts the sampler needs.
    */
  final case class AviVideo(
      frames: Vector[Array[Byte]],
      microSecPerFrame: Int,
      width: Int,
      height: Int)

  /** Pure-JDK AVI container parse: a RIFF chunk walk (the same container
    * family as WAV) that reads `dwMicroSecPerFrame`/width/height from the
    * `avih` header and collects every video-frame chunk (`..dc`/`..db`)
    * under the `movi` LIST. None for anything that isn't a RIFF/AVI with
    * at least one frame — non-video payloads fall through cleanly.
    */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      if (bytes.length < 12 || fourcc() != "RIFF") None
      else {
        bb.getInt // RIFF payload size (trust the walk, not the header)
        if (fourcc() != "AVI ") None
        else {
          var micros = 0
          var w = 0
          var h = 0
          val frames = Vector.newBuilder[Array[Byte]]
          def walk(end: Int): Unit = {
            while (bb.position() + 8 <= end) {
              val id = fourcc()
              val sz = bb.getInt
              // A negative declared size would walk the position backwards
              // (or hold it in place) — no exception, so the NonFatal net
              // below never fires and the loop spins forever on a corrupt
              // or adversarial payload. Malformed → abort the whole parse.
              if (sz < 0) throw new IllegalArgumentException(
                s"malformed AVI: chunk '$id' declares negative size $sz")
              val next = math.min(bb.position() + sz + (sz & 1), end)
              if (id == "LIST") {
                val listType = fourcc()
                // descend only into the lists that can hold headers/frames
                if (listType == "hdrl" || listType == "strl" || listType == "movi" ||
                    listType == "rec ") walk(next)
              } else if (id == "avih" && sz >= 40) {
                micros = bb.getInt
                bb.position(bb.position() + 28) // skip to dwWidth
                w = bb.getInt
                h = bb.getInt
              } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
                  (id.endsWith("dc") || id.endsWith("db")) && sz > 0) {
                val f = new Array[Byte](sz)
                bb.get(f)
                frames += f
              }
              bb.position(next)
            }
          }
          walk(bytes.length)
          val fs = frames.result()
          if (micros <= 0 || fs.isEmpty) None
          else Some(AviVideo(fs, micros, w, h))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling for video assets: every `everyMs` milliseconds, seek the
    * container to that instant and emit the REAL frame payload (AVI frame
    * index = t·1000/µsPerFrame, clamped to the last frame). Payloads the AVI
    * parser can't read keep the deterministic stub tag so the batch shape
    * stays testable end-to-end — the same decodable-real/undecodable-stub
    * contract as `extractFeatures`. 0..n output rows per input row.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[AssetFrames] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = (a.duration_ms / everyMs).toInt
      decodeAvi(a.bytes) match {
        case Some(v) =>
          (0 until n).iterator.map { i =>
            val src = math.min(
              i * everyMs * 1000L / v.microSecPerFrame, v.frames.length - 1L).toInt
            AssetFrames(a.asset_id, i, v.frames(src))
          }
        case None =>
          (0 until n).iterator.map { i =>
            AssetFrames(a.asset_id, i, s"${a.asset_id}:$i".getBytes("UTF-8"))
          }
      }
    }
  }

  /** Measured facts per sampled frame: decode flag + mean luma from the
    * actual pixels (`imageFeatures` slot 3) — what x15's oracle checks
    * against the synthesis arithmetic.
    */
  final case class FrameStat(
      asset_id: Long,
      frame_idx: Int,
      decoded: Boolean,
      mean_luma: Double)

  def frameStats(frames: Dataset[AssetFrames]): Dataset[FrameStat] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        decodeImage(f.frame_bytes) match {
          case Some(img) =>
            FrameStat(f.asset_id, f.frame_idx, decoded = true,
              imageFeatures(img, 4)(3).toDouble)
          case None => FrameStat(f.asset_id, f.frame_idx, decoded = false, 0.0)
        }
      }
    }
  }

  /** Resize images: decodable payloads are really rescaled (area-average
    * scaling, re-encoded as PNG — deterministic); undecodable "image" rows
    * keep their bytes and only the metadata moves, preserving the
    * pre-codec behavior for synthetic payloads.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      if (a.kind != "image") a
      else decodeImage(a.bytes) match {
        case Some(img) =>
          val scaled = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = scaled.createGraphics()
          try {
            g2.drawImage(
              img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
              0, 0, null)
          } finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.setUseCache(false)
          javax.imageio.ImageIO.write(scaled, "png", bos)
          a.copy(bytes = bos.toByteArray, width = w, height = h)
        case None => a.copy(width = w, height = h)
      }
    }
  }

  /** Build a synthetic asset table from the documents testdata (payload =
    * UTF-8 text bytes) — exercises the full binary-column path with real
    * parquet-backed binary data.
    */
  def assetsFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(640)).otherwise(lit(0)).as("width"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(480)).otherwise(lit(0)).as("height"),
        when(pmod(col("doc_id"), lit(3)) =!= 0, (pmod(col("doc_id"), lit(10)) + 1) * 1000L)
          .otherwise(lit(0L)).as("duration_ms"))
      .as[Asset]
  }

  // ------------------------------------------------------- real WAV audio

  /** Seeded amplitude shared by `synthWav` and its property check. */
  def ampFor(seed: Long): Double = 0.25 + math.floorMod(seed, 50L) / 100.0

  /** Deterministic RIFF/WAV payload: PCM16 mono at `sampleRate`, a 500 Hz
    * sine (8 samples per cycle at the 4 kHz default — phases k·π/4, whose
    * mean square is EXACTLY 1/2, so the clip's RMS is amp/√2 up to int16
    * quantization) with seed-dependent amplitude. Real container bytes a
    * real decoder must parse — the synthetic stand-in for fetched audio,
    * since no audio ships in the testdata.
    */
  def synthWav(seed: Long, durationMs: Long, sampleRate: Int = 4000): Array[Byte] = {
    val n = (durationMs * sampleRate / 1000L).toInt
    val amp = ampFor(seed)
    val data = new Array[Byte](44 + n * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII")); bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16); bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
    var i = 0
    while (i < n) {
      val v = amp * math.sin(2 * math.Pi * (i % 8) / 8.0)
      bb.putShort(math.round(v * 32767).toShort)
      i += 1
    }
    data
  }

  /** Audio assets with REAL WAV payloads, one per document: duration
    * (doc_id%10 + 1)·200 ms, seeded amplitude. Payload synthesis and
    * decode both run inside the partition iterator — nothing media-sized
    * touches the driver.
    */
  def audioAssetsFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    // synth+decode is heavy per-row compute: a small parquet arrives as
    // one partition, which would serialize the whole media pass — fan the
    // id spine out to every core first (no-op at cluster scale, where the
    // source already carries enough partitions)
    RelOps.ensureParallelism(documents.select(col("doc_id"))).as[Long].map { id =>
      val durationMs = (math.floorMod(id, 10L) + 1L) * 200L
      Asset(id, "audio", synthWav(id, durationMs), 0, 0, durationMs)
    }
  }

  // ------------------------------------------------ image perceptual hash

  /** 64-bit dHash (difference hash): deterministic area-average downsample
    * to a 9×8 grayscale grid, bit `gy·8+gx` set iff cell (gx+1, gy) is
    * brighter than cell (gx, gy). Invariant to uniform brightness/contrast
    * shifts (gradient SIGNS survive), robust to small localized edits
    * (one source block moves at most its two adjacent comparisons) —
    * the standard cheap image fingerprint for near-dup detection.
    * Manual block averaging, not `getScaledInstance`: the hash must be
    * bit-reproducible across JVMs/platforms.
    */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9
    val gh = 8
    val w = img.getWidth
    val h = img.getHeight
    val means = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh
      val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        means(gy)(gx) = s / ((math.min(y1, h) - y0) * (math.min(x1, w) - x0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (means(gy)(gx + 1) > means(gy)(gx)) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Per-asset perceptual hashes, partition-parallel: (asset_id, phash,
    * decoded). Undecodable payloads report `decoded = false` with hash 0 —
    * filter on `decoded` before pairing.
    */
  def imageHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeImage(a.bytes) match {
          case Some(img) => (a.asset_id, dHash(img), true)
          case None      => (a.asset_id, 0L, false)
        }
      }
    }.toDF("asset_id", "phash", "decoded")
  }

  /** Seeded block gray for `synthPng`: cell (gx, gy) of base `seed` —
    * splitmix-style mixing so distinct bases give independent sign
    * patterns (distinct dHashes, ~32 bits apart).
    */
  def blockGray(seed: Long, gx: Int, gy: Int): Int = {
    var z = seed * 0x9E3779B97F4A7C15L + gx * 0xBF58476D1CE4E5B9L + gy * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (math.floorMod(z ^ (z >>> 31), 200L) + 28L).toInt
  }

  /** Deterministic PNG aligned to the dHash grid: 9×8 blocks of 4×4 px,
    * block (gx, gy) filled with `blockGray(seed, gx, gy)`. With `perturb`,
    * ONE seed-chosen block shifts +40 (clamped) — moving at most the two
    * horizontal comparisons that touch it, so a (base, perturbed-base)
    * pair sits within hamming distance 2 of each other BY CONSTRUCTION
    * (the planted near-dup `synthWav`/`synthAvi` analog; PNG because a
    * lossless container keeps the hash arithmetic exact).
    */
  def synthPng(seed: Long, perturb: Boolean): Array[Byte] = {
    val gw = 9
    val gh = 8
    val cell = 4
    val img = new java.awt.image.BufferedImage(
      gw * cell, gh * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = (math.floorMod(seed, gw.toLong)).toInt
    val py = (math.floorMod(seed / gw, gh.toLong)).toInt
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val base = blockGray(seed, gx, gy)
        val g = if (perturb && gx == px && gy == py) math.min(base + 40, 255) else base
        val rgb = (g << 16) | (g << 8) | g
        var y = gy * cell
        while (y < (gy + 1) * cell) {
          var x = gx * cell
          while (x < (gx + 1) * cell) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        gx += 1
      }
      gy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image assets with REAL PNG payloads, one per document, with PLANTED
    * near-duplicates: docs 2k and 2k+1 share base pattern k, the odd twin
    * carrying the one-block perturbation — so consecutive even/odd pairs
    * are near-dups (dHash hamming ≤ 2) and distinct bases are far apart.
    */
  def imageAssetsFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    RelOps.ensureParallelism(documents.select(col("doc_id"))).as[Long].map { id =>
      Asset(id, "image", synthPng(id / 2, perturb = id % 2 == 1), 36, 32, 0L)
    }
  }

  /** Seeded per-frame gray level shared by `synthAvi` and its checks:
    * frame `i` of video `seed` is a solid gray at this level, so the mean
    * luma of a decoded frame is exactly `frameGray/255` up to JPEG DC
    * quantization — SQL-replayable arithmetic, like `ampFor` for audio.
    */
  def frameGray(seed: Long, frameIdx: Int): Int =
    (math.floorMod(seed * 31L + frameIdx * 7L, 200L) + 28L).toInt

  /** Solid-gray JPEG: the MJPEG frame payload. Uniform blocks survive JPEG
    * DC quantization to within a couple of luma levels, which is what makes
    * the decoded mean checkable against `frameGray`.
    */
  /** Solid-gray JPEG frames are fully determined by (gray, w, h) — 256
    * grays × 2 frame sizes in practice — while a video asset EMITS tens of
    * them, so the per-executor memo turns frame synthesis from the dominant
    * ImageIO-encode cost of the video queries into an array copy. The memo
    * is synthesis-side only (test-payload fabrication); decode stays a real
    * per-frame JPEG parse. Entries are treated as immutable: every consumer
    * (`aviContainer`'s buffer put) copies out of the shared array.
    */
  private val jpegMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()

  def synthJpeg(gray: Int, w: Int = 16, h: Int = 16): Array[Byte] =
    jpegMemo.computeIfAbsent((gray, w, h), { key =>
      val (g, kw, kh) = key
      val img = new java.awt.image.BufferedImage(
        kw, kh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < kh) {
        var x = 0
        while (x < kw) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    })

  /** Deterministic MJPEG-in-AVI payload: a real RIFF/AVI container (hdrl
    * with avih + one 'vids'/'MJPG' stream, movi with one '00dc' JPEG chunk
    * per frame) holding `durationMs·fps/1000` seeded solid-gray frames.
    * Real container bytes a real parser must walk — the video stand-in for
    * fetched media, since no video ships in the testdata (`synthWav`'s
    * playbook applied to the other RIFF family member).
    */
  def synthAvi(seed: Long, durationMs: Long, fps: Int = 2,
      w: Int = 16, h: Int = 16): Array[Byte] = {
    val n = math.max((durationMs * fps / 1000L).toInt, 1)
    aviContainer((0 until n).map(i => synthJpeg(frameGray(seed, i), w, h)), fps, w, h)
  }

  /** RIFF/AVI container assembly for an MJPEG frame sequence — the shared
    * back half of `synthAvi` and `synthAviPattern` (same bytes, different
    * frame arithmetic).
    */
  private def aviContainer(frames: IndexedSeq[Array[Byte]], fps: Int,
      w: Int, h: Int): Array[Byte] = {
    val n = frames.length
    val microsPerFrame = 1000000 / fps
    val moviPayload = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlPayload = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // avih + LIST strl
    val riffPayload = 4 + (8 + hdrlPayload) + (8 + moviPayload)
    val out = java.nio.ByteBuffer.allocate(8 + riffPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = { out.put(s.getBytes("US-ASCII")); () }
    tag("RIFF"); out.putInt(riffPayload); tag("AVI ")
    tag("LIST"); out.putInt(hdrlPayload); tag("hdrl")
    tag("avih"); out.putInt(56)
    out.putInt(microsPerFrame); out.putInt(0); out.putInt(0); out.putInt(0)
    out.putInt(n); out.putInt(0); out.putInt(1); out.putInt(0)
    out.putInt(w); out.putInt(h)
    (0 until 4).foreach(_ => out.putInt(0)) // dwReserved
    tag("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); out.putInt(56)
    tag("vids"); tag("MJPG")
    out.putInt(0); out.putInt(0); out.putInt(0)    // flags, prio+lang, initial
    out.putInt(1); out.putInt(fps)                 // dwScale / dwRate = fps
    out.putInt(0); out.putInt(n); out.putInt(0)    // start, length, bufsize
    out.putInt(-1); out.putInt(0)                  // quality, sample size
    out.putShort(0); out.putShort(0)
    out.putShort(w.toShort); out.putShort(h.toShort) // rcFrame
    tag("strf"); out.putInt(40)
    out.putInt(40); out.putInt(w); out.putInt(h)   // BITMAPINFOHEADER
    out.putShort(1); out.putShort(24); tag("MJPG")
    out.putInt(w * h * 3); out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    tag("LIST"); out.putInt(moviPayload); tag("movi")
    frames.foreach { f =>
      tag("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte)
    }
    out.array()
  }

  /** Video assets with REAL MJPEG-in-AVI payloads for the documents the
    * synthetic asset table types as video (doc_id % 3 = 2): duration
    * (doc_id%10 + 1) seconds at 2 fps, seeded solid-gray frames. Synthesis
    * and decode both run inside the partition iterator — nothing
    * media-sized touches the driver.
    */
  def videoAssetsFromDocuments(spark: SparkSession, documents: DataFrame,
      fps: Int = 2): Dataset[Asset] = {
    import spark.implicits._
    RelOps.ensureParallelism(
      documents.select(col("doc_id")).where(pmod(col("doc_id"), lit(3)) === 2))
      .as[Long].map { id =>
        val durationMs = (math.floorMod(id, 10L) + 1L) * 1000L
        Asset(id, "video", synthAvi(id, durationMs, fps), 16, 16, durationMs)
      }
  }

  // ---------------------------------------------- video perceptual hash

  /** Deterministic MJPEG-in-AVI aligned to the temporal fingerprint grid:
    * 65 solid-gray frames, frame `i` at `blockGray(seed, i, 2)` (splitmix
    * mixing → independent luma-delta signs per seed, so distinct bases sit
    * ~32 bits apart). With `perturb`, ONE seed-chosen frame's gray shifts
    * +40 (clamped) — moving at most its two adjacent luma comparisons, so
    * a (base, twin) pair sits within hamming distance 2 BY CONSTRUCTION.
    * Untouched frames are byte-identical between base and twin, so JPEG
    * quantization can never flip their comparisons — the video member of
    * the `synthPng`/`synthWavPattern` planted-twin family.
    */
  def synthAviPattern(seed: Long, perturb: Boolean, nFrames: Int = 65,
      fps: Int = 5, w: Int = 8, h: Int = 8): Array[Byte] = {
    val pf = math.floorMod(seed, nFrames.toLong).toInt
    aviContainer((0 until nFrames).map { i =>
      val base = blockGray(seed, i, 2)
      synthJpeg(if (perturb && i == pf) math.min(base + 40, 255) else base, w, h)
    }, fps, w, h)
  }

  /** Video assets with PLANTED near-duplicate twins, one per document:
    * docs 2k and 2k+1 share frame-luma pattern k, the odd twin carrying
    * the one-frame perturbation — the video analog of
    * `imageAssetsFromDocuments`/`audioPairAssetsFromDocuments`.
    */
  def videoPairAssetsFromDocuments(spark: SparkSession,
      documents: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    RelOps.ensureParallelism(documents.select(col("doc_id"))).as[Long].map { id =>
      Asset(id, "video", synthAviPattern(id / 2, perturb = id % 2 == 1),
        8, 8, 65L * 200L)
    }
  }

  /** 64-bit video fingerprint: the TEMPORAL analog of `dHash` /
    * `audioFingerprint` — mean luma per decoded frame (real pixels, via
    * `imageFeatures` slot 3), bit `i` set iff frame `i+1` is brighter than
    * frame `i`. Invariant to uniform brightness/contrast shifts (the
    * luma-delta SIGNS survive), robust to single-frame edits (one frame
    * moves only its two adjacent comparisons). A per-frame SPATIAL hash is
    * the wrong clip fingerprint — degenerate on low-texture frames (a
    * solid or smooth frame has no intra-frame gradient, so every clip
    * hashes to 0); a clip's identity lives in its luma envelope over time.
    */
  def videoFingerprint(v: AviVideo): Long = {
    val lumas = v.frames.map(f =>
      decodeImage(f).map(img => imageFeatures(img, 4)(3).toDouble).getOrElse(-1.0))
    var bits = 0L
    var i = 0
    while (i < lumas.length - 1 && i < 64) {
      if (lumas(i + 1) > lumas(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-asset video fingerprints, partition-parallel: (asset_id, vhash,
    * decoded). Undecodable payloads report `decoded = false`, hash 0.
    */
  def videoHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeAvi(a.bytes) match {
          case Some(v) => (a.asset_id, videoFingerprint(v), true)
          case None    => (a.asset_id, 0L, false)
        }
      }
    }.toDF("asset_id", "vhash", "decoded")
  }

  // ---------------------------------------------- audio perceptual hash

  /** 64-bit audio fingerprint: the energy-envelope analog of `dHash` —
    * split the clip into 65 equal windows, bit `i` set iff window `i+1`
    * carries more RMS energy than window `i`. Invariant to uniform gain
    * (energy RATIOS survive), robust to localized edits (one window moves
    * only its two adjacent comparisons) — the cheap clip fingerprint for
    * near-dup audio detection.
    */
  def audioFingerprint(samples: Array[Float], windows: Int = 65): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val rms = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      val lo = (w.toLong * n / windows).toInt
      val hi = math.max(((w + 1).toLong * n / windows).toInt, lo + 1)
      var s = 0.0
      var j = lo
      while (j < math.min(hi, n)) { s += samples(j).toDouble * samples(j); j += 1 }
      rms(w) = s / (math.min(hi, n) - lo)
      w += 1
    }
    var bits = 0L
    var i = 0
    while (i < windows - 1 && i < 64) {
      if (rms(i + 1) > rms(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-asset audio fingerprints, partition-parallel: (asset_id, ahash,
    * decoded). Undecodable payloads report `decoded = false`, hash 0.
    */
  def audioHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeWav(a.bytes) match {
          case Some((samples, _)) => (a.asset_id, audioFingerprint(samples), true)
          case None               => (a.asset_id, 0L, false)
        }
      }
    }.toDF("asset_id", "ahash", "decoded")
  }

  /** Deterministic amplitude-modulated WAV aligned to the fingerprint
    * grid: 65 windows of 25 ms (4 kHz PCM16 mono, 500 Hz carrier), window
    * `w` at amplitude `blockGray(seed, w, 1)/255 · 0.9`. With `perturb`,
    * ONE seed-chosen window's amplitude shifts up (clamped) — moving at
    * most its two adjacent energy comparisons, so a (base, twin) pair
    * sits within hamming distance 2 BY CONSTRUCTION. Untouched windows
    * are sample-identical between base and twin, so quantization can
    * never flip their comparisons.
    */
  def synthWavPattern(seed: Long, perturb: Boolean, windows: Int = 65,
      winMs: Int = 25, sampleRate: Int = 4000): Array[Byte] = {
    val perWin = winMs * sampleRate / 1000
    val n = windows * perWin
    val pw = math.floorMod(seed, windows.toLong).toInt
    val data = new Array[Byte](44 + n * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII")); bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16); bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
    var i = 0
    while (i < n) {
      val w = i / perWin
      val base = blockGray(seed, w, 1) / 255.0 * 0.9
      val amp = if (perturb && w == pw) math.min(base + 0.35, 0.95) else base
      bb.putShort(math.round(
        amp * math.sin(2 * math.Pi * (i % 8) / 8.0) * 32767).toShort)
      i += 1
    }
    data
  }

  /** Audio assets with PLANTED near-duplicate twins, one per document:
    * docs 2k and 2k+1 share envelope pattern k, the odd twin carrying the
    * one-window perturbation — the audio analog of
    * `imageAssetsFromDocuments`.
    */
  def audioPairAssetsFromDocuments(spark: SparkSession,
      documents: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    RelOps.ensureParallelism(documents.select(col("doc_id"))).as[Long].map { id =>
      Asset(id, "audio", synthWavPattern(id / 2, perturb = id % 2 == 1),
        0, 0, 65L * 25L)
    }
  }

  /** Decoded per-asset audio facts. `decoded` is false (and the numeric
    * fields zero) when the payload isn't parseable audio.
    */
  final case class AudioInfo(
      asset_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms_decoded: Long,
      rms: Double,
      decoded: Boolean)

  /** Decode audio assets (partition-parallel) to their measured facts:
    * sample rate and count straight from the decoder, duration derived
    * from them, RMS from the actual samples — the contract a downstream
    * filter (drop sub-second clips, drop silence) consumes.
    */
  def decodeAudioInfo(assets: Dataset[Asset]): Dataset[AudioInfo] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeWav(a.bytes) match {
          case Some((samples, rate)) =>
            var sumSq = 0.0
            var i = 0
            while (i < samples.length) { sumSq += samples(i).toDouble * samples(i); i += 1 }
            val n = samples.length.toLong
            AudioInfo(a.asset_id, rate.toInt, n,
              if (rate > 0) (n * 1000L) / rate.toLong else 0L,
              if (n > 0) math.sqrt(sumSq / n) else 0.0, decoded = true)
          case None => AudioInfo(a.asset_id, 0, 0L, 0L, 0.0, decoded = false)
        }
      }
    }
  }
}
