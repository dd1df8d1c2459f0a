package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.operators.{AnnIndex, TextIndex}
import graft.sources.Catalog

/** Streaming maintenance for the two SERVING indexes on the bundle
  * store — the twins [[PairBundleStream]] and [[LmStream.lmBundleStream]]
  * already gave the pair and LM stores: each micro-batch lands through
  * the VERBATIM batch path with the micro-batch id as the manifest
  * ledger entry, so stream and batch arithmetic cannot drift, the
  * creating batch seeds its own id into the commit, and a crash-replayed
  * micro-batch is rejected atomically by the manifest — exactly-once end
  * to end, no marker files, no re-mark step.
  *
  * At 100 TB these are the steady-state ingest paths of a serving
  * deployment: the text stream tokenizes ONLY the day's arrivals into
  * the existing shard layout (with the corpus-stats delta riding in the
  * same atomic version), and the ANN stream encodes ONLY the batch
  * against the frozen quantizer read back from the bundle itself — the
  * resident index is never rescanned or rewritten by either.
  */
object IndexStream {

  /** Start ingesting parquet document files from `srcDir` into the
    * bundle-backed text index at `root`/`name`.
    */
  def textBundleStream(spark: SparkSession, srcDir: String, root: String,
      name: String = "tix",
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          if (Catalog.latestBundleVersion(s, root, name).isEmpty) {
            TextIndex.writeBundle(batch.toDF(), root, name,
              seedBatchIds = Seq(batchId.toString))
            ()
          } else {
            TextIndex.appendBundle(s, root, name, batch.toDF(),
              batchId.toString)
            ()
          }
        }
      }
      .outputMode("update")
      .start()
  }

  /** embeddings schema as streamed from parquet. */
  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Start ingesting parquet vector files from `srcDir` into the
    * bundle-backed ANN index at `root`/`name`. The index must already
    * exist ([[AnnIndex.writeBundle]] at deployment time — training the
    * quantizer is a modeling decision, not something a micro-batch
    * should do implicitly); every batch is then encoded against the
    * frozen quantizer/codebooks/spill read back from the bundle.
    */
  def annBundleStream(spark: SparkSession, srcDir: String, root: String,
      name: String = "ann",
      checkpointDir: Option[String] = None): StreamingQuery = {
    require(Catalog.latestBundleVersion(spark, root, name).nonEmpty,
      s"annBundleStream: no committed ANN bundle at $root/$name — build " +
        "it with AnnIndex.writeBundle before streaming appends")
    val w = spark.readStream.schema(vectorSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          AnnIndex.appendBundle(batch.sparkSession, root, name,
            batch.toDF(), batchId.toString)
          ()
        }
      }
      .outputMode("update")
      .start()
  }
}
