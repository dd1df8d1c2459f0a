package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextStats

/** Corpus-trained byte-pair encoding (Sennrich, Haddow & Birch, ACL'16 —
  * public): bounded greedy merge rounds over DISTRIBUTED pair counts,
  * then the frozen merge table applied for token counts — upgrading the
  * whitespace/"BPE-ish" heuristics (`TextStats.tokenCount` /
  * `regexTokenCount`) into the trained-model family alongside the NB
  * quality classifier (x116) and the unigram/bigram LMs (x60/x103).
  *
  * The scale shape is the classic BPE trick: training never rescans
  * documents. The corpus collapses ONCE into a distinct-word table with
  * frequencies (Heaps' law keeps it a vanishing fraction of a 100 TB
  * corpus), and every merge round is (a) one map-side-combined pair-count
  * aggregate over that table, (b) ONE driver scalar — the argmax pair,
  * ties broken (count desc, left asc, right asc) so the table is
  * deterministic — and (c) one narrow string map applying the merge.
  * Applying the frozen model to the corpus is a token explode + a join
  * against the word table's final symbol counts; no driver data path
  * anywhere beyond the R merge rows.
  *
  * Words are rendered as `␟`-delimited symbol strings (one symbol
  * per character initially; `␟` is the ASCII unit separator, absent
  * from whitespace-split tokens). A merge (a, b) is ONE plain substring
  * replace of `␟a␟b␟` with `␟ab␟` — left-to-right, non-overlapping:
  * `a a a` merges greedily to `(aa) a` like the reference BPE
  * convention. Deliberate deviation, documented: for a SELF-adjacent
  * run of length ≥ 4 (`a a a a`), the shared boundary separator is
  * consumed by the first match, so a single pass yields `(aa) a a`
  * where exhaustive per-round application would give `(aa)(aa)` —
  * vanishing in natural text (it needs the same symbol ≥ 4× in a row
  * inside one word) and accepted because one replace per round is the
  * convention every SQL engine reproduces bit-for-bit (the x153 oracle
  * replays whole rounds verbatim with the same `replace`).
  *
  * Reference provenance: the reference pipeline tokenizes with fixed
  * heuristics only (GCPDataPipelines has no trained tokenizer); this is
  * part of the training-data extension surface, not reference parity.
  */
object Bpe {

  /** Symbol boundary marker inside the rendered word strings. */
  val Sep = "\u001f"

  /** One merge rule: `left`+`right` fused after `pairCount` votes. */
  final case class Merge(left: String, right: String, pairCount: Long)

  /** Distinct lowercased whitespace words with corpus frequencies, each
    * rendered as a separator-delimited symbol string (initially one
    * symbol per character). The ONLY corpus-sized pass in training.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextStats.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("sym", concat(lit(Sep),
        regexp_replace(col("word"), "(.)", "$1" + Sep)))

  /** Adjacent-symbol pair counts of a word table, frequency-weighted —
    * the per-round aggregate: partial (map-side) sums absorb the skew of
    * ubiquitous pairs before the single shuffle.
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = filter(split(col("sym"), Sep), s => s =!= lit(""))
    words.select(col("freq"), syms.as("ss"))
      .where(size(col("ss")) >= 2)
      .select(col("freq"), explode(zip_with(
        slice(col("ss"), lit(1), size(col("ss")) - 1),
        slice(col("ss"), lit(2), size(col("ss")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Apply one merge to the symbol strings: plain left-to-right
    * non-overlapping substring replace (see object doc).
    */
  def applyMerge(words: DataFrame, m: Merge): DataFrame =
    words.withColumn("sym", call_function("replace", col("sym"),
      lit(Sep + m.left + Sep + m.right + Sep), lit(Sep + m.left + m.right + Sep)))

  /** Lineage bound for [[train]]: after this many merge rounds the word
    * table is re-persisted and the previous anchor freed, so a round's
    * pair-count aggregate never re-executes more than this many stacked
    * `replace` maps. Without the bound, round r re-ran all r prior
    * merges off the original cache — O(R²) narrow work across training,
    * invisible at R=8, pathological at a production merge count.
    */
  val RepersistEvery = 16

  /** Train `rounds` greedy merges over a [[wordTable]]. Returns the
    * frozen merge table (≤ `rounds` rows — the driver's ONLY data) and
    * the word table with final symbol strings (for [[tokenCounts]]).
    * Stops early if the corpus runs out of pairs. Lineage is bounded by
    * [[RepersistEvery]] (the word table re-persists periodically), so a
    * production-sized merge count pays O(R) work and constant plan
    * depth, not O(R²) re-execution — BpeSpec pins a 64-round run's
    * final plan to a handful of nodes over the cached anchor.
    */
  def train(words0: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1 && rounds <= 4096, s"train: rounds=$rounds out of range")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var anchor = words0.persist(lvl)
    var words = anchor
    var sinceAnchor = 0
    val merges = Seq.newBuilder[Merge]
    var exhausted = false
    for (_ <- 1 to rounds if !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += m
        words = applyMerge(words, m)
        sinceAnchor += 1
        if (sinceAnchor >= RepersistEvery) {
          val next = words.persist(lvl)
          next.count() // materialize BEFORE freeing the predecessor —
          // unpersisting first would recompute from the original table
          anchor.unpersist()
          anchor = next
          words = next
          sinceAnchor = 0
        }
      }
    }
    (merges.result(), words)
  }

  /** Apply a frozen merge table in training order — the serve path for
    * any word set, including words the training corpus never saw (an
    * OOV word simply matches fewer merges and stays closer to
    * characters). R narrow maps, no shuffle.
    */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words)(applyMerge)

  /** (word, n_tok) — subword count per distinct word under the trained
    * model, straight off [[train]]'s final symbol strings.
    */
  def tokenCounts(trainedWords: DataFrame): DataFrame =
    trainedWords.select(col("word"),
      size(filter(split(col("sym"), Sep), s => s =!= lit(""))).cast("long")
        .as("n_tok"))

  // ---------------------------------------------------- stored model

  /** Persist a trained merge table — the BPE model's STORED form, the
    * trained-model sibling of the stored indexes (ANN x95, text x129,
    * shingles x147, LSH buckets x152): R rows (round, left, right,
    * pair_count), written once at training time so every downstream
    * tokenization job reads a frozen model instead of retraining. The
    * model is driver-bounded by construction (R ≤ 4096 here; a
    * production 50k-merge vocabulary is still kilobytes).
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i + 1, m.left, m.right, m.pairCount) }
      .toDF("round", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges.parquet")
  }

  /** Read back a [[writeModel]] store, in training order. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Merge] =
    spark.read.parquet(s"$dir/merges.parquet")
      .orderBy(col("round")).collect().toSeq
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3)))

  /** Per-group corpus token counts under a trained model next to the
    * whitespace baseline: explode the corpus's words once, join the
    * distinct-word `tokenCounts`, aggregate. Output per `groupCol`:
    * (groupCol, n_tokens_ws, n_tokens_bpe).
    */
  def corpusTokens(df: DataFrame, groupCol: String, textCol: String,
      wordTokens: DataFrame): DataFrame =
    df.select(col(groupCol), explode(TextStats.tokens(lower(col(textCol))))
        .as("word"))
      .join(wordTokens, Seq("word"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens_ws"), sum(col("n_tok")).as("n_tokens_bpe"))
}
