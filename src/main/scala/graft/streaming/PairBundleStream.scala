package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sources.Catalog

/** Streaming pair-store maintenance ON the atomic bundle store — x174's
  * streaming twin, and the closure of the retired flat PairStream's
  * honestly-stated residual (removed in round 13): there, the
  * pairs+buckets+corpus+marker sequence was four separate writes, so a
  * crash mid-sequence replayed the batch. Here
  * the corpus rides as a THIRD bundle member, so pairs, buckets, the
  * corpus, and the batch ledger publish in ONE manifest rename per
  * micro-batch; a replayed micro-batch id is rejected atomically by the
  * manifest's batch list — no marker files, no crash window, exactly
  * once end to end. The first micro-batch creates the bundle with its
  * own id seeded into the ledger (`commitBundle(batchIds = …)`), so
  * even the creating batch's replay is rejected.
  *
  * Arithmetic is the verbatim batch path ([[Dedup.ingestPairBundle]]) —
  * stream and batch cannot drift.
  */
object PairBundleStream {

  /** Start ingesting parquet document files from `srcDir` into the pair
    * bundle at `root`/`bundle`.
    */
  def pairBundleStream(spark: SparkSession, srcDir: String, root: String,
      bundle: String = "neardup", threshold: Double = 0.9,
      shingleSize: Int = 3, numHashes: Int = 48, bands: Int = 12,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          if (Catalog.latestBundleVersion(s, root, bundle).isEmpty) {
            Dedup.writePairBundle(batch.toDF(), root, bundle, "doc_id",
              "text", threshold, shingleSize, numHashes, bands,
              extraMembers = Seq("corpus" -> batch.toDF()),
              batchIds = Seq(batchId.toString))
            ()
          } else {
            // corpus read PRE-append: cross matches pair the batch
            // against already-ingested docs only
            Dedup.ingestPairBundle(batch.toDF(),
              Catalog.readBundleTable(s, root, bundle, "corpus"),
              root, bundle, batchId.toString, "doc_id", "text", threshold,
              shingleSize, numHashes, bands,
              extraMembers = Seq("corpus" -> batch.toDF()))
            ()
          }
        }
      }
      .outputMode("update")
      .start()
  }
}
