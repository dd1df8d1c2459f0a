package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Checks
import graft.sources.Catalog

/** Streaming distribution-drift monitoring — the streaming twin of the
  * batch PSI audit (x118, `Checks.psiDrift`): a BASELINE histogram is
  * frozen once to a stored table, then every arriving micro-batch is
  * scored against it and a per-batch PSI row appended to a drift log.
  * The lambda shape every online quality monitor wants: the expensive
  * full-corpus pass happens on the batch cadence (re-freeze when the
  * baseline should move), the per-batch cost is one narrow aggregation
  * of the batch plus a (groups×bins)-row align against the frozen
  * counts — nothing rescans history, nothing is stateful in the stream
  * (no watermark: each batch scores independently).
  *
  * Binning and the PSI estimator are `Checks.binCounts` /
  * `Checks.psiFromCounts` VERBATIM, so the frozen baseline, the batch
  * audit, and the per-batch scoring can never disagree on boundaries or
  * smoothing. Alerting is a filter on the log: `psi > 0.25` per the
  * standard reading.
  */
object DriftStream {

  /** Freeze the baseline: per-(group, bin) counts of `valueCol` over the
    * baseline corpus, written as the stored table `ref` (overwrite — a
    * re-freeze replaces the baseline for subsequent batches).
    */
  def freezeBaseline(df: DataFrame, root: String, ref: String,
      groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int): Unit =
    Checks.binCounts(df, groupCols, valueCol, lo, hi, nBins, "__co")
      .write.mode(SaveMode.Overwrite).parquet(Catalog.path(root, ref))

  /** PSI of `batch` against the frozen baseline: returns
    * (groupCols..., psi, n_old = baseline, n_new = batch). Shared by the
    * stream below and any ad-hoc batch check against the same baseline.
    */
  def scoreAgainstBaseline(spark: SparkSession, batch: DataFrame,
      root: String, ref: String, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int, psiRound: Int = 6): DataFrame =
    Checks.psiFromCounts(
      Catalog.table(spark, root, ref),
      Checks.binCounts(batch, groupCols, valueCol, lo, hi, nBins, "__cn"),
      groupCols, nBins, psiRound)

  /** The monitor: each micro-batch scores against the frozen baseline and
    * its per-group PSI rows append to the `logRef` table, stamped with
    * the batch id. Replay-protected by the same batch-id ledger
    * discipline as the other foreachBatch sinks (a replayed batch would
    * otherwise append duplicate log rows) — with the same residual as
    * [[StatsStream]]/[[HistStream]]: a crash between the log append and
    * the marker write replays that batch's rows. Log readers that need
    * the stronger guarantee dedupe on (group, batch_id), which is exact
    * here because the appended rows carry the batch id.
    */
  def driftStream(stream: DataFrame, root: String, baselineRef: String,
      logRef: String, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"${root.stripSuffix("/")}/.${Catalog.tableName(logRef)}_drift_commits",
          batchId.toString)
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          Catalog.writeAppend(
            scoreAgainstBaseline(spark, batch.toDF(), root, baselineRef,
              groupCols, valueCol, lo, hi, nBins)
              .withColumn("batch_id", lit(batchId)),
            root, logRef)
          fs.create(marker, true).close()
        }
      }
      .outputMode("update")
      .start()
  }
}
