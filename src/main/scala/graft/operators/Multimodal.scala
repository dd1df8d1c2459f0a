package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side contract is real and tested: schema, partition-parallel
  * batch processing (`mapPartitions` over typed rows — the Scala analog of
  * a Pandas-UDF `mapInPandas` batch), deterministic output shapes. The
  * actual media decoding is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives a deterministic fake feature vector /
  * frame set from the bytes, so tests pin the plumbing end-to-end while a
  * real deployment swaps in a codec inside the same partition iterator.
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

  /** Feature extraction over a partition-parallel batch iterator. */
  def extractFeatures(assets: Dataset[Asset], dims: Int = 64): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup happens once (codec init in a real deployment)
      it.map(a => AssetFeatures(a.asset_id, a.kind, a.bytes.length.toLong, decodeStub(a.bytes, dims)))
    }
  }

  /** Frame sampling for video assets: every `everyMs` milliseconds, emit a
    * (deterministic stub) frame payload. 0..n output rows per input row.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[AssetFrames] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = (a.duration_ms / everyMs).toInt
      (0 until n).iterator.map { i =>
        // STUB: real impl seeks the container to i*everyMs and decodes a frame
        val tag = s"${a.asset_id}:$i".getBytes("UTF-8")
        AssetFrames(a.asset_id, i, tag)
      }
    }
  }

  /** "Resize" stub for images: passes bytes through and rewrites metadata;
    * real impl decodes + scales inside the same map.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map(a => if (a.kind == "image") a.copy(width = w, height = h) else a)
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
}
