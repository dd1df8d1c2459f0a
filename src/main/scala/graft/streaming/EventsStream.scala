package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the streaming counterpart of
  * the reference's bounded aggregations (SURVEY §7.5 — an extension; the
  * reference itself has no streaming).
  *
  * Patterns covered:
  *   - watermarked tumbling-window counts (`readStream` → window agg →
  *     `writeStream`) — late data beyond the watermark is dropped, state
  *     store stays bounded, so the query runs forever at any rate;
  *   - event-time sessionization with an inactivity gap via
  *     `session_window` — Spark's native session operator merges adjacent
  *     windows in the state store and closes a session when the watermark
  *     passes its gap, which is exactly the semantics a hand-rolled
  *     `flatMapGroupsWithState` would re-implement. (We deliberately do NOT
  *     use `flatMapGroupsWithState` here: in Spark 4.1.2 planning
  *     `FlatMapGroupsWithStateExec` from the microbatch thread NPEs in
  *     `PythonSQLMetrics` init when no active session is set on that thread
  *     — and the built-in operator is both correct and faster, since its
  *     state is managed columnar instead of per-key deserialized objects.)
  *
  * The same transforms run in batch mode — one definition serves the
  * oracle-checked batch query and the streaming query.
  */
object EventsStream {

  /** events schema as streamed from parquet, parameterized on the `ts`
    * physical unit: TIMESTAMP(MICROS) files arrive as native TimestampType;
    * TIMESTAMP(NANOS) files (read under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) arrive as raw-nanos Long.
    * The driver's testdata has shipped BOTH units across rounds, so the
    * streaming source must not hard-code either.
    */
  def schema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Pick the streaming schema by inspecting the directory's parquet footer
    * with a throwaway BATCH read (schema resolution only — no data scan, no
    * job). `readStream` needs the schema up front, so this is the streaming
    * equivalent of `Catalog.events`' arrived-type dispatch.
    */
  def schemaFor(spark: SparkSession, dir: String): StructType =
    schema(spark.read.parquet(dir).schema("ts").dataType match {
      case LongType => LongType
      case _ => TimestampType
    })

  /** Normalize `ts` to TimestampType — the SAME dispatcher the batch reader
    * uses (`Catalog.normalizeTs`), so batch and stream cannot drift on the
    * timestamp unit.
    */
  def normalize(df: DataFrame): DataFrame =
    graft.sources.Catalog.normalizeTs(df)

  /** Tumbling 1-hour counts + value sums per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Watermarked streaming hourlyCounts over a parquet DIRECTORY (file
    * streaming sources list directories; a single-file table must be staged
    * into one). State is bounded by the 2h watermark at any input rate.
    */
  def hourlyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    val src = spark.readStream.schema(schemaFor(spark, dir))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    normalize(src)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exactly-once dedup on event id: duplicates arriving within
    * the watermark horizon are dropped, and state for an id is evicted once
    * the watermark passes its event time — bounded state at any rate, which
    * plain `dropDuplicates` on a stream (state forever) cannot offer. This
    * is the streaming counterpart of batch exact dedup (Dedup.exact): an
    * at-least-once ingest (file redelivery, producer retries) becomes
    * exactly-once downstream.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Click→purchase attribution pairs: every purchase joined to the same
    * user's clicks in the preceding `windowSec` seconds.
    *
    * Batch AND stream-stream: on streams both sides get watermarks and the
    * time-interval predicate bounds the join state — Spark evicts a
    * buffered click once the watermark passes click_ts + window, so state
    * is O(events in the horizon), not O(stream). The join key is the
    * user_id EQUALITY (hash-partitioned shuffle or SMJ; the interval is a
    * post-join filter) — never a nested loop over unrelated users.
    */
  def attributionPairs(events: DataFrame, windowSec: Int = 3600,
      watermark: String = "2 hours"): DataFrame = {
    val clicks0 = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purch0 = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("__pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    val clicks = if (events.isStreaming) clicks0.withWatermark("click_ts", watermark) else clicks0
    val purch = if (events.isStreaming) purch0.withWatermark("purchase_ts", watermark) else purch0
    clicks.join(purch,
        col("user_id") === col("__pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__pu")
  }

  /** Batch last-touch attribution: each purchase credited to the latest
    * qualifying click (deterministic tie-break on click_id).
    */
  def lastTouch(events: DataFrame, windowSec: Int = 3600): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("click_ts").desc, col("click_id").desc)
    attributionPairs(events, windowSec)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        roundz(col("value"), 2).as("value"))
  }

  /** Stream-static enrichment: a stream joined against a bounded dimension
    * (re-planned per micro-batch, broadcast when small — the streaming
    * mirror of J1). No watermark needed: the static side is not stateful.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Streaming anomaly flags: each arriving event is z-scored against
    * PRE-COMPUTED (type, hour) baseline stats — the static output of the
    * batch `Behavior.valueAnomalies` stats pass over history, broadcast
    * into every micro-batch. The standard lambda shape for outlier
    * alerting: the baseline refreshes on the batch cadence, the scoring
    * is stateless per event (no watermark, no streaming state).
    *
    * `baseline` columns: (typeCol, __h, __mu, __sd) — build it with
    * `Behavior.baselineStats`.
    */
  def anomalyStream(events: DataFrame, baseline: DataFrame, z: Double = 3.0,
      typeCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    graft.operators.Behavior.scoreAgainstBaseline(
      events, baseline, z, typeCol, tsCol, valueCol)

  /** Streaming RATE anomalies — `anomalyStream`'s volume-level sibling
    * and the lambda twin of the batch `Behavior.rateAnomalies` (x143):
    * tumbling per-hour counts per type (watermarked — state stays
    * bounded at any rate), each window scored against a FROZEN
    * `Behavior.rateBaseline` built from history, through the SAME
    * `scoreRates` arithmetic the batch query runs — the two cannot
    * drift. Baseline refreshes on the batch cadence; the join is
    * stream-static (stateless, broadcast).
    */
  def rateAnomalyStream(events: DataFrame, baseline: DataFrame,
      zThresh: Double = 2.0, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val counts = events
      .withWatermark(tsCol, "2 hours")
      .groupBy(col(typeCol), window(col(tsCol), "1 hour").as("__w"))
      .agg(count(lit(1)).as("n"))
      .select(col(typeCol), col("__w.start").as("hour"), col("n"))
    graft.operators.Behavior.scoreRates(counts, baseline, zThresh, typeCol)
  }

  /** Streaming ingest → MERGE upsert: each micro-batch is deduped on
    * `keys` (last value per key within the batch wins, by max ts) and
    * MERGEd into the catalog table via `Catalog.upsert` inside
    * `foreachBatch` — the exactly-once keyed-materialization pattern
    * (foreachBatch gives batch-sink transactionality per micro-batch;
    * redeliveries overwrite idempotently instead of duplicating).
    * Returns the started query; callers own its lifecycle.
    */
  def upsertStream(stream: DataFrame, root: String, ref: String,
      keys: Seq[String], tsCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(tsCol).desc)
        val lastPerKey = batch
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        graft.sources.Catalog.upsert(batch.sparkSession, root, ref, lastPerKey, keys)
      }
      .outputMode("update")
      .start()

  /** Streaming ingest → Hive-partitioned append: each micro-batch lands
    * in the `partitionCols` directory layout (`Catalog.writePartitioned`,
    * Append mode), so the table a stream accretes is ALREADY the
    * partition-pruned shape batch readers want (s9's scan saver, fed
    * online). Writers of disjoint partitions never contend; a date-keyed
    * stream touches only today's directory. Pair with `Catalog.compact`
    * per closed partition for small-file hygiene — appends within a
    * micro-batch are file-granular.
    *
    * Pass `checkpointDir` for restart-resume (same contract as the ingest
    * streams: temp checkpoint restarts re-read the source). `foreachBatch`
    * alone is at-least-once — a crash after the append lands but before
    * the checkpoint records the batch replays it on restart — so the sink
    * keeps its own batch-id ledger: a `_graft_commits/<batchId>` marker
    * (underscore-prefixed → invisible to Spark's file listing, like
    * `_SUCCESS`) written after each successful append, checked before.
    * Replays of a fully-appended batch are skipped, which upgrades the
    * common replay path to effectively-once. The residual window — a crash
    * AFTER some batch files land but BEFORE the marker — still duplicates
    * that one batch on restart; closing it needs a transactional table
    * format, which plain parquet directories don't provide.
    */
  def partitionedAppendStream(stream: DataFrame, root: String, ref: String,
      partitionCols: Seq[String],
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
    checkpointDir.fold(w)(w.option("checkpointLocation", _))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          graft.sources.Catalog.path(root, ref), s"_graft_commits/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          graft.sources.Catalog.writePartitioned(batch.toDF(), root, ref,
            partitionCols, org.apache.spark.sql.SaveMode.Append)
          fs.create(marker, true).close()
        }
      }
      .outputMode("append")
      .start()
  }

  /** Per-user event-time sessionization with an inactivity gap.
    *
    * Works identically on a batch DataFrame and on a watermarked stream
    * (append mode: a session row emits once the watermark passes
    * last-event-ts + gap). State per open session is O(1) — window bounds
    * plus the running aggregates — partitioned by user across executors.
    */
  def sessionize(events: DataFrame, gapSec: Int): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"),
        col("total_value"),
        // session_window.end includes the trailing gap; active span is
        // last-event-ts − first-event-ts = (end − gap) − start.
        (unix_timestamp(col("w.end")) - unix_timestamp(col("w.start")) - gapSec)
          .cast("double").as("duration_sec"))
}
