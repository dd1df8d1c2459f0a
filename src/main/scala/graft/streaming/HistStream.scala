package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Stats
import graft.sources.Catalog

/** Streaming maintenance of the DURABLE per-group histogram state — the
  * streaming twin of `Stats.mergeHistTable` (x141), and the quantile
  * companion to [[StatsStream]]: each micro-batch folds to its fixed
  * `bins`-long count vectors and merges into the stored table by
  * element-wise addition, so a standing quantile profile
  * (`Stats.histQuantiles` over the table) stays current as data streams
  * in without ever rescanning history. The cutpoints (lo, hi, bins) are
  * fixed at stream start — they ARE the state's schema; changing them
  * means a new table, exactly like changing the keys.
  *
  * Replay protection via the same batch-id ledger as [[StatsStream]]
  * (the count-vector monoid double-counts replays; the marker check
  * makes a replayed batch a no-op), stored as a SIBLING of the state
  * table so `mergeHistTable`'s upsert swap cannot destroy it. Like
  * StatsStream, this is at-least-once with an idempotence window, not
  * true exactly-once: a crash BETWEEN the completed merge (atomic table
  * swap) and the marker write replays the batch into the merged state —
  * a residual closable only by a transactional table format that
  * commits data and ledger atomically.
  */
object HistStream {

  /** Ledger directory for `ref`'s histogram table (sibling — survives
    * the upsert swap; dot-prefixed — invisible to listings).
    */
  def ledgerDir(root: String, ref: String): String =
    s"${root.stripSuffix("/")}/.${Catalog.tableName(ref)}_hist_commits"

  def histStream(stream: DataFrame, root: String, ref: String,
      keys: Seq[String], valueCol: String, lo: Double, hi: Double,
      bins: Int, checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new HPath(ledgerDir(root, ref), batchId.toString)
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          Stats.mergeHistTable(spark, root, ref,
            Stats.partialHist(batch.toDF(), keys, valueCol, lo, hi, bins),
            keys, bins)
          fs.create(marker, true).close()
        }
      }
      .outputMode("update")
      .start()
  }
}
