package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT order statistics.
  *
  * The built-in `percentile` aggregate buffers every value of a group in one
  * executor's memory — fine per-group when groups are numerous (x33), wrong
  * for a GLOBAL summary at 100 TB where the single final group would hold
  * billions of values. This computes exact interpolated percentiles
  * (`quantile_cont` semantics) with driver/executor memory bounded by
  * O(#partitions + #percentiles), never O(#rows):
  *
  *   1. range-partition the values (the distributed sort Spark would run for
  *      an `ORDER BY`), persist so both passes see the same boundaries
  *      (RangePartitioner samples with a job-dependent seed);
  *   2. per-partition counts → prefix-sum offsets on the driver (O(P) rows);
  *   3. map each target rank p·(n−1) to (partition, local index); rank
  *      within each partition (window partitioned by pid — parallel, unlike
  *      a global `row_number`) and keep only the ≤2·|ps| needed rows;
  *   4. interpolate on the driver.
  *
  * Cost: one shuffle + one persisted pass + one window pass. The exactness
  * tax at scale is the materialized sort; when a sketch is acceptable use
  * `approx_percentile` (x38) instead.
  */
object Stats {

  /** Adaptive exact percentiles: a cheap count picks the plan — at or
    * below `threshold` non-null values the single-task built-in
    * `percentile` aggregate wins (one pass, no persist; 4M doubles
    * ≈ 32 MB buffered, safe), above it the distributed range-partition path
    * takes over. Same interpolation either way.
    *
    * The plan-picking count is TOTAL rows first (no filter → column-pruned
    * to nothing → parquet answers it from footer metadata, no scan), which
    * upper-bounds the non-null count: only when the total exceeds the
    * threshold is the filtered count worth its scan — at small scale the
    * picker costs a metadata read instead of a full pass (x79 paid two of
    * those scans per run).
    */
  def percentiles(
      df: DataFrame,
      valueCol: String,
      ps: Seq[Double],
      names: Seq[String] = Nil,
      threshold: Long = 4L << 20): DataFrame = {
    val outNames =
      if (names.nonEmpty) names else ps.map(p => "p_" + math.round(p * 100))
    val total = df.count()
    val n =
      if (total > threshold) df.where(col(valueCol).isNotNull).count()
      else total
    if (n > threshold) exactPercentiles(df, valueCol, ps, outNames)
    else {
      val arr = expr(
        s"percentile($valueCol, array(${ps.mkString(", ")}))").as("__ps")
      df.agg(arr).select(outNames.zipWithIndex.map { case (nm, i) =>
        element_at(col("__ps"), i + 1).as(nm)
      }: _*)
    }
  }

  /** One-row DataFrame of exact interpolated percentiles of `valueCol`
    * (cast to double, nulls dropped), labelled `names` (defaults p_50 etc).
    */
  def exactPercentiles(
      df: DataFrame,
      valueCol: String,
      ps: Seq[Double],
      names: Seq[String] = Nil,
      partitions: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad percentiles $ps")
    val spark = df.sparkSession
    val outNames =
      if (names.nonEmpty) names
      else ps.map(p => "p_" + math.round(p * 100))
    require(outNames.size == ps.size, "names must pair with ps")

    val ranged = rangeByValue(df, valueCol, partitions)
    try {
      val picked = percentilesOfRanged(ranged, ps)
      spark.range(1).select(outNames.zipWithIndex.map { case (nm, i) =>
        picked.fold(lit(null).cast("double"))(vs => lit(vs(i))).as(nm)
      }: _*)
    } finally ranged.unpersist()
  }

  /** Range-partition `valueCol` (cast double, nulls dropped) into `__v`
    * with a `__pid` partition tag, persisted — the frame
    * `percentilesOfRanged` consumes. Callers own the unpersist; the persist
    * is what lets one ranged pass serve several quantile lookups (and, in
    * `robustScale`, feed the deviation pass without a second source scan).
    */
  private def rangeByValue(df: DataFrame, valueCol: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nPart =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .repartitionByRange(nPart, col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact interpolated percentiles over a `rangeByValue` frame; None when
    * the frame is empty. Driver memory O(#partitions + #percentiles).
    */
  private def percentilesOfRanged(ranged: DataFrame,
      ps: Seq[Double]): Option[Seq[Double]] = {
    val spark = ranged.sparkSession
    import spark.implicits._
    // pass 1: O(P) rows to the driver
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    if (n == 0) None
    else {
      // zero-based interpolation ranks (quantile_cont / Spark `percentile`)
      val targets = ps.map { p =>
        val r = p * (n - 1)
        (math.floor(r).toLong, math.ceil(r).toLong, r - math.floor(r))
      }
      val needed = targets.flatMap { case (lo, hi, _) => Seq(lo, hi) }.distinct
      val offsets = counts.scanLeft(0L)(_ + _._2) // offsets(i) = rows before partition i
      val lookup = needed.map { g =>
        val i = counts.indices
          .find(i => g >= offsets(i) && g < offsets(i) + counts(i)._2)
          .getOrElse(sys.error(s"rank $g outside [0,$n)"))
        (counts(i)._1, g - offsets(i), g)
      }.toDF("__pid", "__li", "__g")

      // pass 2: rank per partition (parallel windows), keep only needed rows
      val w = Window.partitionBy("__pid").orderBy("__v")
      val picked = ranged
        .withColumn("__li", row_number().over(w).cast("long") - 1)
        .join(broadcast(lookup), Seq("__pid", "__li"))
        .select(col("__g"), col("__v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      Some(targets.map { case (lo, hi, frac) =>
        picked(lo) + (picked(hi) - picked(lo)) * frac
      })
    }
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], the max value folded into the last bucket. Two narrow
    * passes — a 1-row min/max aggregate broadcast into the bucketing map,
    * then one partial-agged `groupBy(bucket)` of at most `bins` groups.
    * Empty buckets are absent from the output (join a `sequence` spine to
    * densify if needed). A constant column lands entirely in bucket 0.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 20): DataFrame = {
    require(bins > 0, s"bins=$bins must be positive")
    val v = col(valueCol).cast("double")
    // nulls bucket to null and would surface as a phantom
    // (bucket=null, lo=null, hi=null) row — histogram non-null values only
    // (min/max already ignore nulls, so the bins don't move)
    val nonNull = df.where(v.isNotNull)
    val mm = nonNull.agg(min(v).as("__mn"), max(v).as("__mx"))
    val width = (col("__mx") - col("__mn")) / bins
    val bucket = when(col("__mx") === col("__mn"), lit(0))
      .otherwise(least(floor((v - col("__mn")) / width), lit(bins - 1)))
      .cast("int")
    nonNull.crossJoin(broadcast(mm))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(mm))
      .select(col("bucket"),
        roundz(col("__mn") + col("bucket") * width, 4).as("lo"),
        roundz(col("__mn") + (col("bucket") + 1) * width, 4).as("hi"),
        col("n"))
  }

  /** Winsorize: clip `valueCol` into the exact [lo, hi] percentile range —
    * the standard outlier treatment before scale-sensitive statistics
    * (means, regressions, z-scores). Two passes: the adaptive exact
    * percentile pass yields a 1-row bounds frame that broadcast-joins into
    * a narrow clipping map; nothing data-sized shuffles.
    *
    * Output: `df` plus `as` = clipped value (double).
    */
  def winsorize(df: DataFrame, valueCol: String, lo: Double = 0.01,
      hi: Double = 0.99, as: String = "clipped"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad clip range [$lo, $hi]")
    val bounds = percentiles(df, valueCol, Seq(lo, hi), Seq("__lo", "__hi"))
    // least/greatest skip nulls, so an unguarded clip would coerce a null
    // input to __lo — fabricated data in the exact stats this operator
    // protects. Nulls stay null.
    df.crossJoin(broadcast(bounds))
      .withColumn(as,
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Robust z-score: (x − median) / (1.4826 · MAD), the outlier-resistant
    * standardization (median absolute deviation instead of the stddev a
    * single extreme value can dominate; 1.4826 rescales MAD to σ under
    * normality). Two exact-percentile passes, each a 1-row broadcast —
    * the data itself never shuffles. Nulls stay null; a degenerate
    * MAD = 0 (over half the values identical) yields null rather than
    * ±∞.
    */
  def robustScale(df: DataFrame, valueCol: String, as: String = "robust_z",
      threshold: Long = 4L << 20): DataFrame = {
    // Med and MAD are sequentially dependent order statistics — the naive
    // shape is two full percentile operators (measured 5.4 s vs
    // winsorize's single-pass 3.5 s on the same sf0.1 column). Both plans
    // below collapse the dependency instead of paying it twice:
    //   - small path: the built-in `percentile` aggregate already concedes
    //     ≤threshold values buffered in ONE merge task; the same bound paid
    //     once on the DRIVER (one narrow scan + sort, ≤32 MB at the 4M
    //     default) yields med AND mad with zero further jobs — identical
    //     arithmetic (same sorted values, same n−1 interpolation).
    //   - big path: ONE range-partitioned persist of the values serves the
    //     median lookup AND feeds the deviation pass (which must re-range
    //     by |x−med|, but now from the in-memory column, not a second
    //     source scan).
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val total = df.count() // no filter: parquet answers from footer metadata
    val n = if (total > threshold) vals.count() else total
    def interp(sorted: Array[Double], p: Double): Double = {
      val r = p * (sorted.length - 1)
      val lo = math.floor(r).toInt
      val hi = math.ceil(r).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (r - lo)
    }
    val medMad: Option[(Double, Double)] =
      if (n == 0) None
      else if (n <= threshold) {
        // `n` counts rows (footer-metadata count), not non-null values — an
        // all-null column reaches here with an empty collect; that's the
        // documented null-output case, not an index error.
        val xs = vals.collect().map(_.getDouble(0))
        if (xs.isEmpty) None
        else {
          java.util.Arrays.sort(xs)
          val med = interp(xs, 0.5)
          var i = 0
          while (i < xs.length) { xs(i) = math.abs(xs(i) - med); i += 1 }
          java.util.Arrays.sort(xs)
          Some((med, interp(xs, 0.5)))
        }
      } else {
        val ranged = rangeByValue(vals, "__v")
        try {
          percentilesOfRanged(ranged, Seq(0.5)).map(_.head).map { med =>
            val dev = rangeByValue(
              ranged.select(abs(col("__v") - med).as("__v")), "__v")
            try (med, percentilesOfRanged(dev, Seq(0.5)).map(_.head).getOrElse(0.0))
            finally dev.unpersist()
          }
        } finally ranged.unpersist()
      }
    medMad match {
      case Some((med, mad)) if mad > 0 =>
        df.withColumn(as,
          when(col(valueCol).isNotNull,
            (col(valueCol).cast("double") - med) / (1.4826 * mad)))
      case _ => df.withColumn(as, lit(null).cast("double"))
    }
  }

  // ------------------------------------ mergeable aggregate state (x107)

  /** Per-group ALGEBRAIC aggregate state — (n, sum, sumsq, min, max) of
    * `valueCol` per `keys` tuple. The state is group-sized, not row-sized,
    * and MERGEABLE: two states combine by component-wise sum/min/max
    * ([[mergeStats]]), so a standing corpus summary absorbs a new batch by
    * merging partials instead of rescanning history — the same
    * partial/final algebra Spark runs inside one job, lifted to a durable
    * table ACROSS jobs ([[mergeStatsTable]]; the steady-state cost of
    * "stats over 100 TB + today's batch" becomes one scan of the batch
    * plus a group-sized merge).
    *
    * Null values don't contribute (standard aggregate semantics): n counts
    * non-nulls, an all-null group carries sum 0 / min-max null.
    */
  def partialStats(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(keys.map(col): _*).agg(
      count(v).as("__n"),
      coalesce(sum(v), lit(0.0)).as("__sum"),
      coalesce(sum(v * v), lit(0.0)).as("__sumsq"),
      min(v).as("__min"),
      max(v).as("__max"))
  }

  /** Merge any number of [[partialStats]] states on the same keys: the
    * component-wise monoid (sums add, extrema combine). Exact — merged
    * state is bit-for-bit the algebra of a single pass over the union,
    * modulo float summation order (absorbed by the caller's rounding).
    */
  def mergeStats(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStats: no states")
    states.reduce(_.unionByName(_)).groupBy(keys.map(col): _*).agg(
      sum(col("__n")).as("__n"),
      sum(col("__sum")).as("__sum"),
      sum(col("__sumsq")).as("__sumsq"),
      min(col("__min")).as("__min"),
      max(col("__max")).as("__max"))
  }

  /** Fold a batch's [[partialStats]] state into a DURABLE state table —
    * the cross-job steady state: the stored table always equals
    * `partialStats` over every row ever merged, yet each merge scans only
    * the batch plus the (group-sized) state rows it touches.
    *
    *   - first batch creates the table;
    *   - later batches semi-join the stored state down to the AFFECTED
    *     groups, merge those with the batch's partials (the component-wise
    *     monoid), and `Catalog.upsert` swaps the merged rows in —
    *     untouched groups are carried over by the upsert's anti-join,
    *     never re-aggregated.
    *
    * Idempotence caveat: merging the SAME batch twice double-counts
    * (the monoid has no dedup) — at-least-once pipelines need a batch-id
    * ledger in front, as the streaming sinks keep (`EventsStream`).
    */
  def mergeStatsTable(spark: org.apache.spark.sql.SparkSession, root: String,
      ref: String, batchState: DataFrame, keys: Seq[String]): Unit = {
    import graft.sources.Catalog
    if (!Catalog.tableExists(spark, root, ref))
      Catalog.writeTruncate(batchState, root, ref)
    else {
      val affected = Catalog.table(spark, root, ref)
        .join(batchState.select(keys.map(col): _*), keys, "left_semi")
      Catalog.upsert(spark, root, ref,
        mergeStats(keys, affected, batchState), keys)
    }
  }

  /** Finalize a state into presentation stats: n, sum, mean, SAMPLE
    * stddev (n−1; null when n < 2 — the same contract as the built-in
    * `stddev`), min, max. Rounding is the caller's (oracle-alignment)
    * concern.
    */
  def finalizeStats(state: DataFrame, keys: Seq[String]): DataFrame = {
    val variance = (col("__sumsq") - col("__sum") * col("__sum") / col("__n")) /
      (col("__n") - lit(1))
    state.select(keys.map(col) ++ Seq(
      col("__n").as("n"),
      col("__sum").as("sum"),
      // guarded: an all-null group has n=0 and 0.0/0 is NaN, not null
      when(col("__n") > 0, col("__sum") / col("__n")).as("mean"),
      // clamp tiny negative variance from float cancellation before sqrt
      when(col("__n") > 1, sqrt(greatest(variance, lit(0.0))))
        .otherwise(lit(null).cast("double")).as("sd"),
      col("__min").as("min"),
      col("__max").as("max")): _*)
  }

  /** Per-key equi-width histogram STATE over `[lo, hi)` — the mergeable
    * quantile companion to [[partialStats]]' moments: a fixed `bins`-long
    * count vector (values below `lo` clamp into bin 0, at/above `hi` into
    * the last bin) that merges by element-wise addition, so a standing
    * 100 TB profile can absorb a batch by adding two arrays per group
    * instead of re-sorting history — the exact-rank alternative
    * (`percentile`/sort) cannot merge at all, and `approx_percentile`
    * sketches are not engine-replayable. The bin arithmetic is integer-
    * exact given the cutpoints, so an oracle replays it bit-for-bit.
    */
  def partialHist(df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"partialHist: bad range [$lo,$hi)/$bins")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) / lit(width)).cast("int")))
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ bin.as("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    // dense vector per key: start from zeros, add each (bin, count) in
    val asVec = counts.groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("__b"), col("__c"))).as("__bc"))
      .select(keys.map(col) :+ aggregate(col("__bc"),
        transform(sequence(lit(0), lit(bins - 1)), _ => lit(0L)),
        (acc, e) => transform(acc, (c, i) =>
          when(i === e.getField("__b"), c + e.getField("__c")).otherwise(c)))
        .as("__hist"): _*)
    asVec
  }

  /** Merge any number of [[partialHist]] states on the same keys:
    * element-wise long addition (groups absent from one state contribute
    * an implicit zero vector via the union). Exact — longs, no floats.
    *
    * Every incoming vector is length-checked at row eval: `zip_with`
    * over count vectors of different lengths would silently produce
    * null elements — corrupting the durable quantile state — so a
    * cutpoint/bins mismatch raises instead.
    */
  def mergeHist(keys: Seq[String], bins: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeHist: no states")
    val checked = when(size(col("__hist")) === bins, col("__hist"))
      .otherwise(raise_error(concat(
        lit(s"mergeHist: state vector of length "),
        size(col("__hist")).cast("string"),
        lit(s" cannot merge under bins=$bins")))
        .cast("array<bigint>"))
    states.map(_.withColumn("__hist", checked)).reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(aggregate(collect_list(col("__hist")),
        transform(sequence(lit(0), lit(bins - 1)), _ => lit(0L)),
        (acc, h) => zip_with(acc, h, _ + _)).as("__hist"))
  }

  /** Fold a batch's [[partialHist]] state into a DURABLE histogram table
    * — [[mergeStatsTable]]'s quantile-state twin, completing the standing
    * profile: the stored table always equals `partialHist` over every row
    * ever merged, yet each merge scans only the batch plus the affected
    * group rows ([[Catalog.upsert]] carries untouched groups via its
    * anti-join). `bins` must match the stored states — count vectors of
    * different lengths have no common cutpoints and must not merge.
    * Same idempotence caveat as the stats table: at-least-once pipelines
    * need a batch-id ledger in front.
    */
  def mergeHistTable(spark: org.apache.spark.sql.SparkSession, root: String,
      ref: String, batchState: DataFrame, keys: Seq[String], bins: Int): Unit = {
    import graft.sources.Catalog
    if (!Catalog.tableExists(spark, root, ref))
      Catalog.writeTruncate(batchState, root, ref)
    else {
      val affected = Catalog.table(spark, root, ref)
        .join(batchState.select(keys.map(col): _*), keys, "left_semi")
      Catalog.upsert(spark, root, ref,
        mergeHist(keys, bins, affected, batchState), keys)
    }
  }

  /** Linear-interpolated quantile estimates from a (merged) histogram
    * state, one output column per requested q: with `target = q·n`, the
    * estimate is `lo + width·(bin + (target − cumBefore)/cnt)` at the
    * first bin whose cumulative count reaches the target — deterministic
    * arithmetic over exact integer counts, replayable by any engine from
    * the same cutpoints (rounding is the caller's concern). n rides along
    * as `n`.
    */
  def histQuantiles(state: DataFrame, keys: Seq[String],
      lo: Double, hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    val width = (hi - lo) / bins
    val n = aggregate(col("__hist"), lit(0L), _ + _)
    val cum = transform(sequence(lit(0), lit(bins - 1)), i =>
      aggregate(slice(col("__hist"), lit(1), i + 1), lit(0L), _ + _))
    val withN = state.withColumn("__n", n).withColumn("__cum", cum)
    // per q: first bin with cum >= target, via a filtered index sequence
    val est = qs.map { q =>
      val target = col("__n") * lit(q)
      val idxs = filter(sequence(lit(0), lit(bins - 1)),
        i => element_at(col("__cum"), i + 1) >= target)
      val bin = coalesce(element_at(idxs, 1), lit(bins - 1))
      val cumBefore = when(bin === 0, lit(0L))
        .otherwise(element_at(col("__cum"), bin))
      val cnt = element_at(col("__hist"), bin + 1)
      when(col("__n") === 0, lit(null).cast("double"))
        .otherwise(lit(lo) + lit(width) * (bin
          + when(cnt === 0, lit(0.0)).otherwise((target - cumBefore) / cnt)))
        .as(s"p${(q * 100).round}")
    }
    withN.select(keys.map(col) ++ Seq(col("__n").as("n")) ++ est: _*)
  }

  /** Cohen's kappa between two boolean columns — chance-corrected
    * agreement, the standard check that two FILTERS (a quality gate, a
    * dedup gate, a classifier, a human label) measure the same thing
    * rather than merely both firing often: κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement and p_e the agreement two
    * independent raters with the same marginals would reach by chance.
    * One full-scan aggregation to four exact long cell counts; all the
    * ratio arithmetic runs on that single row, so any engine replays it
    * from the same counts. κ is null when p_e = 1 (a degenerate table —
    * both raters constant — has no chance-corrected signal).
    *
    * Output: one row (n, po, pe, kappa), ratios rounded to 6.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.agg(
      count(lit(1)).as("__n"),
      sum(when(col(aCol) && col(bCol), 1L).otherwise(0L)).as("__n11"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).as("__n10"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).as("__n01"))
    val n = col("__n").cast("double")
    val n00 = col("__n") - col("__n11") - col("__n10") - col("__n01")
    val po = (col("__n11") + n00) / n
    val pa = (col("__n11") + col("__n10")) / n
    val pb = (col("__n11") + col("__n01")) / n
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    cells.select(
      col("__n").as("n"),
      roundz(po, 6).as("po"),
      roundz(pe, 6).as("pe"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise(roundz((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }
}
