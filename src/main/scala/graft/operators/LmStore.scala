package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextStats
import graft.sources.Catalog

/** Mergeable unigram-LM count store — the model store whose sufficient
  * statistic MERGES: unlike the frozen DSIR LM pair
  * ([[graft.streaming.DsirStream.freezeLms]] — fit once, serve forever)
  * or the frozen BPE merges, a unigram LM is fully determined by its
  * word-count table, and counts merge by ADDITION. So the store holds
  * the FULL count table (Heaps-bounded — a vanishing fraction of the
  * corpus) and absorbs a document batch with one vocab-sized staged
  * rewrite, never a corpus rescan; the top-K vocabulary and the add-one
  * denominator derive from the stored counts at load time under exactly
  * `unigramLm`'s convention, so a model loaded after N batch ingests is
  * bit-identical to one fitted on the concatenated corpus (spec-pinned
  * ingest ≡ refit).
  *
  * Ingest is LEDGERED like the pair store
  * ([[graft.operators.Dedup.ingestPairBatch]]): counts double on replay,
  * so a batch id already in the ledger is skipped. Same honestly-stated
  * residual: the rewrite+marker sequence is not atomic — a crash between
  * swap and marker replays the batch; closable only by a transactional
  * table format.
  */
object LmStore {

  /** Word-count table of a corpus slice: (tok, c) — the LM's sufficient
    * statistic, one hash shuffle with map-side partials.
    */
  def counts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextStats.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  def ledgerDir(dir: String): String = s"$dir/.batch_ledger"

  /** Build the store from an initial corpus; clears the ingest ledger
    * (a rebuild starts a fresh history, like `writePairStore`).
    */
  def write(docs: DataFrame, textCol: String, dir: String): Unit = {
    counts(docs, textCol).write.mode("overwrite")
      .parquet(s"$dir/counts.parquet")
    val ledger = new HPath(ledgerDir(dir))
    val fs = ledger.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(ledger)) { fs.delete(ledger, true); () }
  }

  /** Ledgered count-merge ingest: the stored counts union the batch's
    * counts, group-sum, land in a staging directory (the read of the old
    * table completes before the swap), and atomically replace the store.
    * Returns true iff the batch was ingested (false = replay, store
    * untouched).
    */
  def ingest(batch: DataFrame, textCol: String, dir: String,
      batchId: String): Boolean = {
    require(batchId.nonEmpty && !batchId.contains("/"),
      s"LmStore.ingest: batchId must be a plain name, got '$batchId'")
    val spark = batch.sparkSession
    val marker = new HPath(ledgerDir(dir), batchId)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      val dst = new HPath(s"$dir/counts.parquet")
      val staged = new HPath(dst.getParent, s".${dst.getName}.merging")
      spark.read.parquet(dst.toString)
        .unionByName(counts(batch, textCol))
        .groupBy(col("tok")).agg(sum(col("c")).as("c"))
        .write.mode("overwrite").parquet(staged.toString)
      Catalog.atomicSwap(fs, staged, dst, "LmStore.ingest")
      fs.create(marker, true).close()
      true
    }
  }

  /** Record a batch id in the ledger WITHOUT ingesting — the streaming
    * twin marks the store-CREATING batch with this ([[write]] clears the
    * ledger, so the creating micro-batch's own id must be re-marked or
    * its replay after a crash would double-ingest through [[ingest]]).
    */
  def mark(spark: SparkSession, dir: String, batchId: String): Unit = {
    val marker = new HPath(ledgerDir(dir), batchId)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
  }

  /** Load the LM off the stored counts under `unigramLm`'s exact
    * convention: (top-`vocabSize` vocab frame `(tok, c)` with the
    * count-desc/token-asc tiebreak, add-one denominator `n + v + 1` over
    * the TOTAL token count). Driver traffic: one K-row collect + one
    * 1-row sum — same as in-query fitting.
    */
  def load(spark: SparkSession, dir: String,
      vocabSize: Int): (DataFrame, Double) = {
    require(vocabSize > 0, s"vocabSize=$vocabSize must be positive")
    val cnt = spark.read.parquet(s"$dir/counts.parquet")
    val top = cnt.orderBy(col("c").desc, col("tok")).limit(vocabSize).collect()
    val nRow = cnt.agg(sum(col("c"))).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val vocabDf = spark.createDataFrame(
      spark.sparkContext.parallelize(top.toIndexedSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add("tok", "string").add("c", "long"))
    (vocabDf, (n + top.length + 1).toDouble)
  }
}
