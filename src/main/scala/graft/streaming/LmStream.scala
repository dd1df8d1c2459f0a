package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LmStore

/** Streaming LM count-store maintenance — x169's streaming twin: every
  * micro-batch of documents merges into the stored word-count table
  * through the VERBATIM batch path ([[graft.operators.LmStore.ingest]]),
  * so the LM stays current as the corpus grows and stream and batch
  * cannot drift on the arithmetic. The first batch creates the store
  * ([[graft.operators.LmStore.write]]); each later batch costs one
  * batch-sized count pass plus a vocab-sized staged rewrite.
  *
  * Replay protection is the ingest's OWN ledger (LmStore keys it by the
  * micro-batch id), unlike [[PairStream]], which needs an extra coarser
  * marker because it must also gate a corpus append — here the count
  * store is the only state.
  */
object LmStream {

  /** Start merging parquet document files from `srcDir` into the LM
    * count store at `dir`.
    */
  def lmStream(spark: SparkSession, srcDir: String, dir: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
            s.sparkContext.hadoopConfiguration)
          if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/counts.parquet"))) {
            LmStore.write(batch.toDF(), "text", dir)
            // write clears the ledger — re-mark the creating batch so a
            // replay of THIS micro-batch is normally rejected. Residual
            // (same write→mark gap LmStore documents): a crash BETWEEN
            // write and mark replays the creating batch through ingest
            // and doubles its counts; closable only by publishing counts
            // and marker in one atomic step (the bundle-manifest ledger,
            // Catalog.appendBundle, is that shape)
            LmStore.mark(s, dir, batchId.toString)
          } else {
            LmStore.ingest(batch.toDF(), "text", dir, batchId.toString)
            ()
          }
        }
      }
      .outputMode("update")
      .start()
  }

  /** The bundle-backed twin — [[lmStream]] with the manifest as the
    * ledger ([[graft.operators.LmStore.writeBundle]]/[[
    * graft.operators.LmStore.ingestBundle]]): the creating micro-batch
    * seeds its own id INTO the commit manifest, so every crash window
    * is closed — a replayed create commits an identical superseding
    * snapshot (readers resolve the latest version only), and a replayed
    * ingest is rejected by the manifest atomically. No re-mark step
    * exists because no marker exists.
    */
  def lmBundleStream(spark: SparkSession, srcDir: String, root: String,
      name: String, checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          if (graft.sources.Catalog.latestBundleVersion(s, root, name).isEmpty) {
            LmStore.writeBundle(batch.toDF(), "text", root, name,
              Seq(batchId.toString))
            ()
          } else {
            LmStore.ingestBundle(batch.toDF(), "text", root, name,
              batchId.toString)
            ()
          }
        }
      }
      .outputMode("update")
      .start()
  }
}
