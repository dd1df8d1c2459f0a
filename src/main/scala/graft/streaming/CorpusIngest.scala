package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.sources.Catalog

/** Streaming corpus ingestion with per-micro-batch decontamination: each
  * arriving batch of documents is deduplicated within itself (exact,
  * min-id keeper) and against the corpus accumulated so far (exact hash
  * anti-join + MinHash-LSH near-dup — `Dedup.incrementalDedup`), then
  * appended to the corpus table.
  *
  * The corpus table IS the state: no streaming state store grows with the
  * corpus, restarts resume from the source checkpoint plus whatever the
  * table already holds, and `foreachBatch` gives per-micro-batch batch-sink
  * semantics. This is the streaming twin of x52 — one definition of the
  * dedup logic serves both.
  *
  * At 100 TB the only change is precomputing corpus LSH signatures into a
  * side table instead of recomputing them per batch (they are pure
  * functions of the text — see SCALE.md); the per-batch work is then
  * batch-sized, not corpus-sized.
  */
object CorpusIngest {

  /** documents schema as streamed from parquet. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Within-batch exact dedup: keep the min-id row per distinct text. */
  private def dedupWithinBatch(batch: DataFrame): DataFrame = {
    val keep = batch.groupBy(sha2(col("text"), 256).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    batch.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Start ingesting parquet files from `srcDir` into the corpus table at
    * `root`/`ref`, decontaminating every micro-batch. The target table may
    * start absent (first batch creates it).
    *
    * Alongside the corpus, the stream maintains `<ref>_lsh` — the corpus's
    * LSH bucket index (`Dedup.lshBuckets` output). Each batch matches
    * against the INDEX, not a corpus re-signature: per-batch work is
    * batch-sized + one index join, and the corpus text is read only to
    * verify semi-join-pruned candidates. Signatures are pure functions of
    * the text, so appending the kept rows' buckets keeps the index exactly
    * in sync with the table.
    */
  def ingestStream(spark: SparkSession, srcDir: String, root: String,
      ref: String, threshold: Double = 0.9, shingleSize: Int = 3,
      numHashes: Int = 48, bands: Int = 12,
      checkpointDir: Option[String] = None): StreamingQuery = {
    // Index self-heal runs ONCE per stream start, not per micro-batch: the
    // crash window it bounds is a restart event, and the corpus-sized
    // anti-join would otherwise make every batch's work corpus-sized —
    // contradicting this file's own scaling contract. The flag lives in the
    // foreachBatch closure (driver-side, one per query run), so a restart
    // naturally re-arms it.
    val reconciled = new java.util.concurrent.atomic.AtomicBoolean(false)
    // without a durable checkpointDir Spark uses a temp checkpoint: restarts
    // re-read all of srcDir (the dedup anti-joins keep results correct; the
    // start-time reconcile plus per-batch work make the rescan only costly,
    // never wrong)
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val idxRef = s"${ref}_lsh"
        val fresh = dedupWithinBatch(batch)
        val corpusExists = Catalog.tableExists(s, root, ref)
        // composed inline (not via incrementalDedup) so the persisted
        // matches frame is unpersisted per micro-batch — a long-running
        // stream must not accrete cached blocks batch after batch
        val matches =
          if (!corpusExists) None
          else {
            val corpus = Catalog.table(s, root, ref)
            // Self-heal the index before the first match of this run: the
            // corpus append and the index append below are two writes, and
            // a crash between them leaves corpus rows unindexed —
            // near-duplicates of those rows would be admitted FOREVER.
            // Reconciling (ids-only anti-join, both scans column-pruned)
            // once at start closes that window; within a run the two
            // appends stay in sync by construction.
            val idxExists = Catalog.tableExists(s, root, idxRef)
            if (!idxExists)
              Catalog.writeAppend(Dedup.lshBuckets(corpus, "doc_id", "text",
                shingleSize, numHashes, bands), root, idxRef)
            else if (reconciled.compareAndSet(false, true)) {
              val unindexed = corpus.join(
                Catalog.table(s, root, idxRef).select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
              if (!unindexed.isEmpty)
                Catalog.writeAppend(Dedup.lshBuckets(unindexed, "doc_id", "text",
                  shingleSize, numHashes, bands), root, idxRef)
            }
            Some((Dedup.incrementalExactDupIds(fresh, corpus, "doc_id", "text"),
              Dedup.incrementalMinhashMatchesWithIndex(fresh, corpus,
                Catalog.table(s, root, idxRef), "doc_id", "text", threshold,
                shingleSize, numHashes, bands)))
          }
        val kept = matches match {
          case None => fresh
          case Some((exactIds, near)) =>
            fresh.join(exactIds, Seq("doc_id"), "left_anti")
              .join(near.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_anti")
        }
        // materialize WITH lineage truncation before the append: `kept`
        // reads the corpus table the first write extends, and a plain
        // persist is not enough — writeAppend's refreshByPath invalidates
        // every cache whose plan contains the corpus path, so the index
        // append would silently recompute the anti-joins against the
        // already-extended corpus and index NOTHING (every batch would
        // manufacture exactly the unindexed-orphan window the start-time
        // reconcile exists to repair). localCheckpoint rebases the kept
        // rows onto a materialized RDD with no file-source lineage.
        val rows = kept.localCheckpoint(true)
        try {
          Catalog.writeAppend(rows, root, ref)
          Catalog.writeAppend(
            Dedup.lshBuckets(rows, "doc_id", "text", shingleSize, numHashes, bands),
            root, idxRef)
        } finally {
          matches.foreach { case (_, near) => near.unpersist(); () }
          ()
        }
      }
      .outputMode("append")
      .start()
  }
}
