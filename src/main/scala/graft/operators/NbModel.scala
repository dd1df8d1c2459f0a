package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextStats

/** Stored multinomial Naive Bayes model — the classifier member of the
  * trained-model store family (BPE merges `Bpe.writeModel`, frozen DSIR
  * LMs `DsirStream.freezeLms`): the label×vocab log-prob grid, the label
  * priors, and the document total persist as tables at training time, so
  * every downstream gating job classifies against ONE frozen model
  * instead of refitting (refits on different corpus slices would drift
  * the gate). The grid is vocab×labels rows (Heaps-bounded vocabulary ×
  * a handful of labels) and stays distributed end to end; priors and
  * meta are label-bounded/one-row. Flat layout on purpose: the serve
  * joins on arbitrary document tokens, so there is no per-query pruning
  * dimension to partition for (unlike the text index's term shards).
  *
  * Log-probs are IEEE doubles and parquet round-trips their bits
  * exactly, so serve-off-store ≡ fit-in-query row-for-row (spec-pinned);
  * serve-time OOV tokens (absent from the stored vocabulary) contribute
  * nothing — the standard frozen-multinomial convention, exercised by
  * training on a corpus half and serving the whole.
  */
object NbModel {

  /** Persist a fitted model (per [[TextStats.naiveBayesFit]]). */
  def write(grid: DataFrame, priors: DataFrame, nTotal: Double,
      dir: String): Unit = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.write.mode("overwrite").parquet(s"$dir/grid.parquet")
    priors.coalesce(1).write.mode("overwrite").parquet(s"$dir/priors.parquet")
    Seq(nTotal).toDF("n_total")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** Fit on `docs` and persist — the one-call training job. */
  def trainWrite(docs: DataFrame, textCol: String, labelCol: String,
      dir: String): Unit = {
    val (grid, priors, nTotal) = TextStats.naiveBayesFit(docs, textCol, labelCol)
    write(grid, priors, nTotal, dir)
  }

  /** Read a stored model back: (grid, priors, nTotal). */
  def read(spark: SparkSession, dir: String): (DataFrame, DataFrame, Double) =
    (spark.read.parquet(s"$dir/grid.parquet"),
      spark.read.parquet(s"$dir/priors.parquet"),
      spark.read.parquet(s"$dir/meta.parquet").collect()(0).getDouble(0))

  /** Classify documents against the FROZEN stored model, through the
    * same scoring + argmax stages the in-query path uses
    * ([[TextStats.naiveBayesScoresFromModel]] /
    * [[TextStats.naiveBayesArgmax]]) — the two cannot drift. Output:
    * (idCol, labelCol, predicted); `predicted` null when no token of the
    * document is in the stored vocabulary.
    */
  def predict(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, labelCol: String,
      scoreRound: Int = 6): DataFrame = {
    val (grid, priors, nTotal) = read(spark, dir)
    TextStats.naiveBayesArgmax(docs,
      TextStats.naiveBayesScoresFromModel(docs, idCol, textCol, grid,
        priors, nTotal, scoreRound),
      idCol, labelCol)
  }
}
