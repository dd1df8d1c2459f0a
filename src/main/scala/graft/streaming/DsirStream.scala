package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextStats
import graft.sources.Catalog

/** Streaming DSIR scoring: documents arriving on a stream are scored with
  * `TextStats.scoreImportance` against LMs fitted ONCE, offline, and frozen
  * as side tables — the streaming twin of the batch `importanceWeights`
  * (x84), sharing its scoring stage verbatim so the two can never drift.
  *
  * The LMs are frozen for the same reason `VectorIngest` freezes its coarse
  * quantizer: refitted per batch they would drift with arrival order, and
  * every previously-scored document's weight would be stale against the new
  * LM. Refreshing the LMs is an offline maintenance job that rescores the
  * corpus — exactly like an index rebuild.
  *
  * Scale: per-batch work is batch-sized (token explode + two K-bounded
  * broadcast joins + one partial-agged groupBy); the scored table IS the
  * state — no streaming state store grows with the corpus, and restarts
  * resume from the source checkpoint (when the caller supplies a durable
  * `checkpointDir` — see `scoreStream`) plus the table (id anti-join keeps
  * scoring exactly-once per document across replays either way).
  */
object DsirStream {

  /** Fit both LMs (the `fitUnigramLm` convention) and freeze them as side
    * tables: `<ref>_dsir_svoc` / `<ref>_dsir_tvoc` (tok, c) and
    * `<ref>_dsir_meta` (the two denominators). Run offline, before the
    * scoring stream starts.
    */
  def freezeLms(source: DataFrame, target: DataFrame, textCol: String,
      vocabSize: Int, root: String, ref: String): Unit = {
    val spark = source.sparkSession
    import spark.implicits._
    val (sv, sd) = TextStats.fitUnigramLm(source, textCol, vocabSize)
    val (tv, td) = TextStats.fitUnigramLm(target, textCol, vocabSize)
    Catalog.writeTruncate(sv, root, s"${ref}_dsir_svoc")
    Catalog.writeTruncate(tv, root, s"${ref}_dsir_tvoc")
    Catalog.writeTruncate(Seq((sd, td)).toDF("sdenom", "tdenom"),
      root, s"${ref}_dsir_meta")
  }

  /** Load the frozen LMs: (srcVocab, srcDenom, tgtVocab, tgtDenom). */
  def loadLms(spark: SparkSession, root: String,
      ref: String): (DataFrame, Double, DataFrame, Double) = {
    val meta = Catalog.table(spark, root, s"${ref}_dsir_meta").collect().head
    (Catalog.table(spark, root, s"${ref}_dsir_svoc"), meta.getDouble(0),
      Catalog.table(spark, root, s"${ref}_dsir_tvoc"), meta.getDouble(1))
  }

  /** Score parquet document batches from `srcDir` against the frozen LMs
    * at `root`/`ref`, appending (doc_id, dsir_w) to `scoredRef`. Fails
    * loudly if the LMs were never frozen — falling back to per-batch LMs
    * would make every score depend on arrival order.
    *
    * Pass `checkpointDir` for restart-resume from the source offset log.
    * Without it Spark uses a TEMP checkpoint: a restart re-reads every
    * file in `srcDir` (the doc_id anti-join keeps results correct, but the
    * rescan cost grows with the directory).
    */
  def scoreStream(spark: SparkSession, srcDir: String, root: String,
      ref: String, scoredRef: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(CorpusIngest.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        require(Catalog.tableExists(s, root, s"${ref}_dsir_meta"),
          s"DsirStream.scoreStream: no frozen LMs at $root/${ref}_dsir_meta " +
            "- run freezeLms first (per-batch LMs would drift with arrival order)")
        val (sv, sd, tv, td) = loadLms(s, root, ref)
        // exactly-once per doc across replays: ids-only anti-join against
        // the scored table's column-pruned spine
        val fresh0 = batch.toDF().dropDuplicates("doc_id")
        val fresh =
          if (!Catalog.tableExists(s, root, scoredRef)) fresh0
          else fresh0.join(
            Catalog.table(s, root, scoredRef).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
        // the scoring plan reads the table the append extends (anti-join) —
        // rebase onto a materialized RDD first, same contract as the ingest
        // streams (see CorpusIngest on refreshByPath vs persisted lineage)
        val rows = fresh.localCheckpoint(true)
        Catalog.writeAppend(
          TextStats.scoreImportance(rows, "doc_id", "text", tv, td, sv, sd),
          root, scoredRef)
      }
      .outputMode("append")
      .start()
  }
}
