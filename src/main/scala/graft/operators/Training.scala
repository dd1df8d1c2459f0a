package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz

import graft.functions.{Staging, TextStats}

/** Training-data assembly: the last mile between a curated corpus and a
  * training job — deterministic splits, sequence packing, repetition
  * gates. All are narrow maps or single well-keyed shuffles; nothing here
  * touches the driver with data-sized state.
  */
object Training {

  /** Deterministic train/val/test assignment from a content-independent
    * key hash. `bucket = int(md5(key)[:8], 16) % 100` — stable across
    * runs, engines, and cluster layouts (md5 of the key's string form, no
    * seed, no RNG), so a re-run or a different engine assigns every row
    * identically: the property that keeps eval contamination out when the
    * corpus is re-processed incrementally.
    *
    * A narrow map — no shuffle, no state. `trainPct`/`valPct` are
    * percentage points of the 100-bucket space.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10, as: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    val bucket =
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    df.withColumn("bucket", bucket)
      .withColumn(as,
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Sequence packing, concat-and-chop semantics: within a shard,
    * documents are concatenated in key order and the token stream is
    * chopped into `budget`-token training sequences; each document is
    * tagged with the sequence its first token lands in and its start
    * offset. This is the standard streaming pack for LLM pretraining
    * (no bin-packing search — deterministic, one pass).
    *
    * The running token offset is a window sum per shard, so parallelism =
    * #shards: size `nShards` to the cluster (e.g. 2-3× total cores at
    * 100 TB), exactly like real packers that pack per input shard. Shard
    * assignment is `key % nShards` — deterministic, no RNG.
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Int, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "packSequences needs budget/nShards > 0")
    val shard = (col(keyCol) % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("start_tok",
        (sum(col(tokenCol)).over(w) - col(tokenCol)).cast("long"))
      .withColumn("seq_id", floor(col("start_tok") / budget).cast("long"))
      .withColumn("seq_off", (col("start_tok") % budget).cast("long"))
  }

  /** Global dense 1-based rank in seeded-hash order WITHOUT a
    * single-partition window — the two-pass offset pattern every
    * distributed sharder uses: range-partition on the hash (partition i
    * then holds a contiguous hash range), rank locally per partition,
    * and shift each partition's local ranks by the total row count of
    * the partitions before it (ONE bounded collect: a row per shuffle
    * partition). The result is exactly the rank a global sort would
    * assign, at ordinary-shuffle cost instead of a 1-partition
    * bottleneck — and deterministic: ranks depend only on (hash, key)
    * order, never on where the sampled range boundaries happen to land.
    *
    * The range-partitioned frame is persisted for the call (the offset
    * pass and the rank pass must see the SAME boundaries — recomputing
    * would re-sample them); ownership of that cache follows the
    * [[graft.Lifecycle.withCachedInputs]] contract.
    */
  def globalHashRank(df: DataFrame, keyCol: String, seed: Long = 42L,
      as: String = "rank"): DataFrame = {
    val parted = df
      .withColumn("__h", xxhash64(lit(seed), col(keyCol)))
      .repartitionByRange(col("__h"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
    graft.Lifecycle.withCachedInputs(parted) {
      val offsets = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__n"))
        .collect().sortBy(_.getInt(0))
      val cum = offsets.scanLeft(0L)((acc, r) => acc + r.getLong(1)).init
      val offMap = map(offsets.zip(cum).toIndexedSeq.flatMap { case (r, off) =>
        Seq(lit(r.getInt(0)), lit(off))
      }: _*)
      val w = Window.partitionBy(col("__pid")).orderBy(col("__h"), col(keyCol))
      parted.withColumn("__local", row_number().over(w))
        .withColumn(as,
          element_at(offMap, col("__pid")) + col("__local"))
        .drop("__h", "__pid", "__local")
    }
  }

  /** Per-GROUP portable hash rank: `globalHashRank`'s two-pass shape
    * (range partition → local row_number → bounded per-partition offsets;
    * no single-partition window anywhere) ranking WITHIN each group, in
    * the order of a PORTABLE md5 hash (`md5("<seed>|<key>")` — replayable
    * by any engine, where xxhash64 is Spark-private). Driver traffic is
    * one (partitions × groups)-row collect — `groupCol` must be
    * low-cardinality (sources, domains, labels; the usual mixing axes).
    * Group values must not contain `|` (they key the offset map).
    */
  def groupPortableRank(df: DataFrame, keyCol: String, groupCol: String,
      seed: Long = 42L, as: String = "rank"): DataFrame = {
    val parted = df
      .withColumn("__h",
        md5(concat_ws("|", lit(seed.toString), col(keyCol).cast("string"))))
      .repartitionByRange(col(groupCol), col("__h"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
    graft.Lifecycle.withCachedInputs(parted) {
      val counts = parted.groupBy(col("__pid"), col(groupCol).cast("string").as("__g"))
        .agg(count(lit(1)).as("__n")).collect()
      val offEntries = counts.groupBy(_.getString(1)).toSeq.flatMap {
        case (g, rows) =>
          val sorted = rows.sortBy(_.getInt(0))
          val cum = sorted.scanLeft(0L)((acc, r) => acc + r.getLong(2)).init
          sorted.zip(cum).map { case (r, off) => (s"$g|${r.getInt(0)}", off) }
      }
      val offMap = map(offEntries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      val w = Window.partitionBy(col("__pid"), col(groupCol))
        .orderBy(col("__h"), col(keyCol))
      parted.withColumn("__local", row_number().over(w))
        .withColumn(as,
          element_at(offMap, concat_ws("|", col(groupCol).cast("string"),
            col("__pid").cast("string"))) + col("__local"))
        .drop("__h", "__pid", "__local")
    }
  }

  /** Deterministic round-robin interleave across sources — the training
    * ORDER counterpart of the mixing-SELECTION operators (x100 rates,
    * x74 budgets): rows get a global position such that consuming them
    * in position order visits sources in strict rotation
    * (`pos ≡ sourceIndex (mod nSources)`), each source's internal order
    * a seeded portable-hash shuffle. Batches drawn sequentially then see
    * every source uniformly instead of whole sources back-to-back — the
    * curriculum/data-ordering contract SGD mixing wants, reproducible
    * bit-for-bit from (seed, keys) alone.
    *
    * When a source exhausts, its later slots are simply absent: the
    * position sequence keeps gaps, and consumption in position ORDER
    * continues round-robin over the remaining sources. Positions are
    * integer arithmetic end-to-end — `(rank−1)·nSources + srcIndex` —
    * so an external engine replays them exactly.
    */
  def interleaveBySource(df: DataFrame, keyCol: String, srcCol: String,
      seed: Long = 42L, as: String = "global_pos"): DataFrame = {
    // bounded: one row per distinct source (the mixing axis)
    val srcs = df.select(col(srcCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val idxMap = map(srcs.zipWithIndex.toIndexedSeq.flatMap {
      case (s, i) => Seq(lit(s), lit(i.toLong)) }: _*)
    groupPortableRank(df, keyCol, srcCol, seed, as = "__rk")
      .withColumn(as, (col("__rk") - 1L) * lit(srcs.length.toLong) +
        element_at(idxMap, col(srcCol).cast("string")))
      .drop("__rk")
  }

  /** Deterministic, EXACTLY balanced shard assignment — the shard-writer
    * contract for training corpora: shard sizes differ by at most one
    * (shards 0 .. n mod k − 1 carry the extra row), membership is a pure
    * function of (seed, key) so a re-run reproduces the same shards, and
    * the seeded hash order IS the corpus shuffle (no RNG state). Built on
    * `globalHashRank`: shard = (rank − 1) mod k, i.e. rows deal out
    * round-robin in hash order — balance is exact BY CONSTRUCTION, not in
    * expectation like a plain `hash(key) mod k`.
    */
  def balancedShards(df: DataFrame, keyCol: String, nShards: Int,
      seed: Long = 42L, as: String = "shard"): DataFrame = {
    require(nShards > 0, s"balancedShards: nShards=$nShards must be > 0")
    globalHashRank(df, keyCol, seed, as = "__rank")
      .withColumn(as, ((col("__rank") - 1) % nShards).cast("int"))
      .drop("__rank")
  }

  /** Dominance cap: at most `maxPerGroup` rows per group — bounds any one
    * source/domain's share of a training corpus (boilerplate-heavy domains
    * otherwise dominate by sheer volume). A rank-filtered window, which
    * Spark plans with WindowGroupLimit(Partial) BELOW the exchange — each
    * map task forwards at most `maxPerGroup` rows per group, so the
    * reducers see groups × partitions × cap rows however skewed the
    * source distribution is (the skewed-source case is exactly when the
    * cap matters). `orderCols` picks WHICH rows survive — make it a total
    * order for deterministic output.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, "capPerGroup needs maxPerGroup > 0")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Unbiased deterministic sample of `nPerGroup` rows per group: rows are
    * ranked inside each group by the md5 of their key — a reproducible
    * stand-in for random order, so the surviving rows are an unbiased
    * sample yet identical across runs, engines, and partitionings (where
    * `capPerGroup(orderCols = id)` deliberately keeps the FIRST rows,
    * this keeps a RANDOM-looking subset). Same WindowGroupLimit(Partial)
    * plan: each map task forwards at most nPerGroup rows per group.
    */
  def sampleNPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
      nPerGroup: Int): DataFrame = {
    require(nPerGroup > 0, "sampleNPerGroup needs nPerGroup > 0")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nPerGroup)
      .drop("__rn")
  }

  /** Weighted sample WITHOUT replacement, `nPerGroup` rows per group, by
    * the Efraimidis–Spirakis priority: each row draws a deterministic
    * uniform u from the md5 of its key and ranks by u^(1/weight) — the
    * classic one-pass reservoir order in which the top-n per group is an
    * exact weighted sample without replacement. The training-mix builder:
    * "sample documents proportional to quality score" without collecting
    * anything.
    *
    * Determinism and engine-portability: u = (md5-bucket + 0.5) / 2³²
    * (never exactly 0 or 1), and the priority is rounded to 9 decimals so
    * any engine replaying the same formula ranks identical values (ties
    * broken by key). Plan shape: rank-filtered window →
    * WindowGroupLimit(Partial) below the exchange, same as
    * `sampleNPerGroup`. Weights must be strictly positive.
    */
  def weightedSampleNPerGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, weightCol: String, nPerGroup: Int): DataFrame = {
    require(nPerGroup > 0, "weightedSampleNPerGroup needs nPerGroup > 0")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    // u^(1/w) with w ≤ 0 silently inverts the ranking (u^negative > 1) —
    // fail loudly in-plan instead
    val wPos = when(col(weightCol).cast("double") > 0, col(weightCol).cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSampleNPerGroup: non-positive weight in '"),
        lit(weightCol), lit("' ("), col(weightCol).cast("string"),
        lit(") - weights must be strictly positive"))))
    val priority = roundz(pow(u, lit(1.0) / wPos), 9)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(priority.desc, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nPerGroup)
      .drop("__rn")
  }

  /** Token-budget mixing: keep whole documents per source, in
    * deterministic md5-rank order, while the source's running token total
    * stays under its budget — how a pretraining mix hits target
    * per-source token proportions. A document is kept iff the total
    * BEFORE it is under budget, so the last kept document may overshoot
    * by at most one document; sources absent from `budgets` keep nothing.
    *
    * Scale shape: the per-source prefix sum does NOT run as one serial
    * window per source (sources are few — that plan dies at 100 TB the
    * same way a 5-partition rank window does). Instead the first md5 hex
    * digit splits every source into 16 range buckets that are monotone in
    * the sampling order; per-(source, bucket) token sums come back to the
    * driver (sources × 16 rows), prefix-sum into bucket offsets, and the
    * window runs per (source, bucket) — parallelism = sources × 16, the
    * `rankFamily` trick applied to a cumulative sum.
    */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, keyCol: String,
      tokenCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix needs at least one source budget")
    val spark = df.sparkSession
    import spark.implicits._
    val mk = md5(col(keyCol).cast("string"))
    // first hex digit: 16 buckets, monotone in the (md5, key) sample order
    // because the md5 string sorts lexicographically over hex chars
    val bkt = conv(substring(mk, 1, 1), 16, 10).cast("int")
    val budget = budgets.foldLeft(lit(-1L)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    // unbudgeted sources keep nothing by contract, so drop them BEFORE the
    // per-bucket aggregate, the driver collect, and the window: this
    // bounds the collected counts to |budgets|×16 rows regardless of how
    // many sources the corpus has, and the window never sorts rows that
    // were headed for the filter anyway
    val withB = df
      .where(col(sourceCol).cast("string").isin(budgets.keys.toSeq: _*))
      .withColumn("__bkt", bkt)
    val perBucket = withB.groupBy(col(sourceCol).cast("string").as("s"), col("__bkt").as("b"))
      .agg(sum(col(tokenCol).cast("long")).as("t"))
      .as[(String, Int, Long)].collect()
    val offsets = perBucket.groupBy(_._1).iterator.flatMap { case (s, rows) =>
      val sorted = rows.sortBy(_._2)
      val offs = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(offs).map { case ((_, b, _), off) => (s, b, off) }
    }.toSeq
    val offsetDf = offsets.toDF("__os", "__ob", "__off")
    val w = Window.partitionBy(col(sourceCol), col("__bkt"))
      .orderBy(mk, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsetDf),
        col(sourceCol).cast("string") <=> col("__os") && col("__bkt") === col("__ob"))
      .withColumn("__before",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol) + col("__off"))
      .where(col("__before") < budget)
      .drop("__bkt", "__os", "__ob", "__off", "__before")
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021 §A1.1:
    * repetitious documents are low-quality):
    *   - `dup_token_frac`: 1 − distinct/total tokens — pure per-row array
    *     expressions, no shuffle;
    *   - `top_token_frac`: most-frequent-token share — explode → two
    *     hash aggregations, both map-side combinable (the same shape as
    *     vocab counting, keyed by doc so never skewed beyond one doc's
    *     tokens).
    * `keep` applies the gate; thresholds per the Gopher defaults scaled
    * to token level.
    */
  /** Temperature-weighted source mixing — the standard multi-source /
    * multilingual LLM sampling recipe: source `s` with `n_s` documents
    * gets sampling weight `w_s ∝ n_s^alpha`, so `alpha = 1` reproduces the
    * natural distribution, `alpha = 0` samples sources uniformly, and the
    * usual `alpha ∈ (0, 1)` upweights rare sources without drowning the
    * head. Per-source keep rate `min(1, targetFraction·N·w_s / n_s)`,
    * applied through the deterministic hash gate
    * ([[RelOps.stratifiedHashSample]]) — engine-reproducible, no RNG.
    *
    * Scale shape: ONE bounded aggregate (a row per source) to the driver
    * for the rate table; the sample itself is a broadcastable
    * stratum→threshold CASE over one scan — no shuffle of the corpus.
    */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    require(targetFraction >= 0.0 && targetFraction <= 1.0,
      s"targetFraction out of [0,1]: $targetFraction")
    // bounded: one row per source
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df.limit(0)
    else {
      val total = counts.values.sum.toDouble
      val powSum = counts.toSeq.sortBy(_._1)
        .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
      val fractions = counts.map { case (s, n) =>
        val w = math.pow(n.toDouble, alpha) / powSum
        s -> math.min(1.0, targetFraction * total * w / n.toDouble)
      }
      RelOps.stratifiedHashSample(df, keyCol, strataCol, fractions)
    }
  }

  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      maxDupFrac: Double = 0.75, maxTopFrac: Double = 0.30): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    // one tokenize, one explode, two keyed aggregations (both map-side
    // combinable): per-(doc, token) counts, then per-doc the distinct
    // count IS the group count, the total is the sum, the mode the max
    Staging.explodeStaged(df, Seq(idCol), toks, "tok")
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol),
        roundz(lit(1.0) - col("n_distinct").cast("double") / col("n_tok"), 6)
          .as("dup_token_frac"),
        roundz(col("top_c").cast("double") / col("n_tok"), 6)
          .as("top_token_frac"))
      .withColumn("keep",
        col("dup_token_frac") <= maxDupFrac && col("top_token_frac") <= maxTopFrac)
  }
}
