package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming pair-store maintenance — x159's streaming twin: every
  * micro-batch of documents is ingested through the VERBATIM batch path
  * ([[graft.operators.Dedup.appendPairStore]]), so the near-dup pair
  * TRUTH and the LSH bucket index underneath stay current as the corpus
  * grows, and stream and batch cannot drift on the arithmetic. The
  * first batch creates the bundle ([[graft.operators.Dedup.writePairStore]])
  * and the corpus table; each later batch costs one batch-sized
  * signature pass — cross matches off the stored index, within-batch
  * pairs locally, its own buckets appended.
  *
  * Replay protection: unlike CorpusIngest (whose per-batch anti-joins
  * are naturally idempotent), appendPairStore's appends are NOT — a
  * replayed batch would double its bucket and pair rows — so each batch
  * id is gated by the same marker-file ledger as
  * [[StatsStream]]/[[HistStream]]. (Batch orchestrators get the same
  * guard from [[graft.operators.Dedup.ingestPairBatch]]; this stream
  * keeps its own coarser marker because it must also gate the corpus
  * append.) Same honestly-stated residual: the
  * pairs+buckets+corpus+marker sequence is not atomic, so a crash
  * mid-sequence replays the batch. [[PairBundleStream]] CLOSES this on
  * the atomic bundle store — corpus as a third member, ledger in the
  * manifest, one rename per micro-batch; this marker-file twin stays
  * as the directly-appendable-store variant.
  */
object PairStream {

  def ledgerDir(dir: String): String = s"$dir/.pair_ledger"

  /** Start ingesting parquet document files from `srcDir`, maintaining
    * the pair-store bundle and the corpus table under `dir`.
    */
  def pairStream(spark: SparkSession, srcDir: String, dir: String,
      threshold: Double = 0.9, shingleSize: Int = 3, numHashes: Int = 48,
      bands: Int = 12, checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val marker = new HPath(ledgerDir(dir), batchId.toString)
        val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker) && !batch.isEmpty) {
          val corpusPath = s"$dir/corpus.parquet"
          if (!fs.exists(new HPath(s"$dir/pairs.parquet"))) {
            Dedup.writePairStore(batch.toDF(), dir, "doc_id", "text",
              threshold, shingleSize, numHashes, bands)
          } else {
            // corpus must be read PRE-append: cross matches pair the batch
            // against already-ingested docs only; within-batch pairs come
            // from the batch itself inside appendPairStore
            Dedup.appendPairStore(batch.toDF(), s.read.parquet(corpusPath),
              dir, "doc_id", "text", threshold, shingleSize, numHashes, bands)
          }
          batch.toDF().write.mode("append").parquet(corpusPath)
          fs.create(marker, true).close()
        }
      }
      .outputMode("update")
      .start()
  }
}
