package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Stats
import graft.sources.Catalog

/** Streaming maintenance of the DURABLE per-group stats state — the
  * streaming twin of `Stats.mergeStatsTable` (x107): each micro-batch
  * folds to its group-sized partial state and merges into the stored
  * table, so a standing corpus summary stays current as data streams in,
  * at per-batch cost of one batch scan plus a group-sized merge — history
  * is never rescanned.
  *
  * Exactly-once: the stats monoid DOUBLE-COUNTS a replayed batch (unlike
  * an idempotent upsert), so the sink keeps a batch-id ledger — a marker
  * per committed batch id, checked before merging, written after. The
  * ledger lives in a SIBLING directory of the state table, not inside it:
  * `mergeStatsTable`'s upsert replaces the table directory via atomic
  * swap, which would destroy any markers stored within. Same residual
  * window as the partitioned-append sink (crash between merge and
  * marker), closable only by a transactional table format.
  */
object StatsStream {

  /** Ledger directory for `ref`'s state table (sibling — survives the
    * upsert swap; dot-prefixed — invisible to directory listings).
    */
  def ledgerDir(root: String, ref: String): String =
    s"${root.stripSuffix("/")}/.${Catalog.tableName(ref)}_stats_commits"

  def statsStream(stream: DataFrame, root: String, ref: String,
      keys: Seq[String], valueCol: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new HPath(ledgerDir(root, ref), batchId.toString)
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          Stats.mergeStatsTable(spark, root, ref,
            Stats.partialStats(batch.toDF(), keys, valueCol), keys)
          fs.create(marker, true).close()
        }
      }
      .outputMode("update")
      .start()
  }
}
