package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe rank-family computation (rank / ntile / percent_rank /
  * cume_dist) within low-cardinality groups.
  *
  * The naive plan — `Window.partitionBy(group)` — serializes each group
  * through ONE task: with 5 priority classes, exactly 5 tasks sort the
  * whole table while the rest of a 1000-executor cluster idles. That plan
  * does not survive a 100× scale-up.
  *
  * Two-pass shape used here instead (classic distributed ranking):
  *   1. per-group range boundaries of the leading sort column
  *      (`approx_percentile`, one partial-agg pass) split every group into
  *      `nBuckets` range buckets — parallelism becomes groups × buckets;
  *   2. per-(group, bucket) row counts (tiny: groups × buckets rows)
  *      come back to the driver, where prefix sums give each bucket its
  *      global rank offset within its group;
  *   3. a window partitioned by (group, bucket) computes the local
  *      row_number; local + broadcast offset = exact global rank, because
  *      bucket assignment is monotone in the sort key (rows with equal
  *      leading values always share a bucket, and the full sort key breaks
  *      ties inside it).
  * From the exact rank and the group totals, the whole family follows
  * arithmetically (sort keys are unique by contract, so rank = row_number
  * and cume_dist = rank / N):
  *   percent_rank = (rank − 1) / (N − 1)   (0.0 for a 1-row group)
  *   cume_dist    = rank / N
  *   ntile(n)     = first N mod n buckets get ⌈N/n⌉ rows, the rest ⌊N/n⌋
  * — the same definitions Spark's window functions implement.
  *
  * Driver memory is O(groups × nBuckets); the operator is for the
  * low-group-cardinality case (that is exactly when the naive window plan
  * is at its worst). The leading sort column must be numeric (range
  * boundaries come from approx_percentile).
  */
object Ranks {

  // NOTE on top-k per group: no custom operator is needed. Spark plans a
  // WindowGroupLimit(Partial) BELOW the exchange for rank-function <= k
  // filters, so each map task forwards only its local per-group top-k and
  // the low-cardinality partition key never sees the full table. A
  // hand-rolled two-phase (spark_partition_id local top-k, then final
  // window) plans one MORE exchange than the built-in — measured, removed.
  // rankFamily below is different: percent_rank/cume_dist output every
  // row, so no group-limit pushdown exists and the two-pass plan is real.

  def rankFamily(df: DataFrame, groupCol: String, sortCols: Seq[String],
      ntileN: Int = 4, nBuckets: Int = 32, maxGroups: Int = 100000): DataFrame = {
    require(sortCols.nonEmpty, "rankFamily needs at least one sort column")
    val spark = df.sparkSession
    import spark.implicits._
    val lead = sortCols.head

    // The driver-side boundary/offset maps key groups by string, but pass
    // 2's window partitions by the raw column — and groupBy/Window
    // normalize -0.0 == 0.0 while cast("string") yields "-0.0" vs "0.0".
    // Adding 0.0 to fractional group keys applies the same IEEE
    // normalization BEFORE the cast, so the string-keyed maps can never
    // split (and double-count) a window partition.
    val gNorm = df.schema(groupCol).dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => col(groupCol) + lit(0.0)
      case _ => col(groupCol)
    }
    val gStr = gNorm.cast("string")

    // pass 1a: per-group range boundaries of the leading sort column.
    // Accuracy doesn't matter for correctness — any monotone split works —
    // only for balance, so the default accuracy is fine. The boundaries are
    // COLLECTED once and re-enter both downstream passes as literals:
    // approx_percentile's partial merges are shuffle-order-dependent, so
    // letting passes 1b and 2 each re-execute the aggregate could hand
    // them DIFFERENT split points — offsets computed against one bucketing
    // and ranks against another (silently wrong ranks). Driver cost is
    // groups × nBuckets doubles, the operator's stated contract.
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val spark0 = df.sparkSession
    val boundaryRows = df.groupBy(gStr.as("__g"))
      .agg(expr(s"approx_percentile($lead, array(${probs.mkString(",")}), 10000)")
        .as("__bnd"))
    // Loud guard on the driver-side contract, folded into the collect the
    // pass already makes: CollectLimit stops pulling at maxGroups+1 rows,
    // so a high-cardinality misuse fails with this message after fetching
    // a BOUNDED number of boundary rows instead of OOMing the driver —
    // and the guarded path costs zero extra jobs (when the limit isn't
    // hit, the limited collect IS the complete boundary set).
    val collected = boundaryRows.limit(maxGroups + 1).collect().toIndexedSeq
    require(collected.size <= maxGroups,
      s"rankFamily saw more than $maxGroups distinct '$groupCol' groups; " +
        "this operator trades driver memory (groups x nBuckets rows) for " +
        "parallelism within LOW-cardinality groups. For high-cardinality " +
        "keys use a plain Window.partitionBy (it already parallelizes), " +
        "or raise maxGroups if the driver has headroom.")
    val boundaries = spark0.createDataFrame(
      spark0.sparkContext.parallelize(collected, 1),
      boundaryRows.schema)

    // bucket = #boundaries strictly below the row's leading value: monotone
    // in the leading value, equal values share a bucket. The boundary array
    // is nBuckets-1 elements, so the interpreted HOF fold is ~nBuckets ops
    // per row on a broadcast-joined local array. An all-null group yields a
    // null boundary array — coalesce folds it to bucket 0 instead of a
    // null bucket that would crash the typed collect below.
    val bucketed = df
      // null-safe join: a null group is a group like any other to a window
      // function — plain === would silently drop its rows
      .join(broadcast(boundaries), gStr <=> col("__g"))
      .withColumn("__bkt",
        aggregate(coalesce(col("__bnd"), array()), lit(0),
          (acc, b) => acc + when(col(lead) > b, 1).otherwise(0)))
      .drop("__g", "__bnd")

    // pass 1b: per-(group, bucket) counts → driver (groups × nBuckets rows)
    // → per-bucket global offsets and per-group totals
    val counts = bucketed.groupBy(gStr.as("g"), col("__bkt").as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)]
      .collect()
    val offsets: Seq[(String, Int, Long, Long)] = counts
      .groupBy(_._1)
      .iterator
      .flatMap { case (g, rows) =>
        val total = rows.map(_._3).sum
        val sorted = rows.sortBy(_._2)
        val offs = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(offs).map { case ((_, b, _), off) => (g, b, off, total) }
      }
      .toSeq
    val offsetDf = offsets.toDF("__og", "__ob", "__off", "__n")

    // pass 2: local row_number within (group, bucket), plus the broadcast
    // offset — exact global rank within the group
    val w = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(sortCols.map(col).toIndexedSeq: _*)
    val ranked = bucketed
      .join(broadcast(offsetDf),
        gStr <=> col("__og") && col("__bkt") === col("__ob"))
      .withColumn("__rank", row_number().over(w) + col("__off"))

    val n = col("__n")
    val r = col("__rank")
    // ntile: first (N mod k) buckets take ⌈N/k⌉ rows, the rest ⌊N/k⌋.
    // Column `/` is double division even on integers — keep the bucket
    // arithmetic integral with floor().
    val small = floor(n / ntileN)
    val big = small + lit(1L)
    val rem = n % ntileN
    val ntileCol = when(small === 0, r) // N < k: one row per bucket
      .when(r <= rem * big, floor((r - 1) / big) + 1)
      .otherwise(rem + floor((r - rem * big - 1) / small) + 1)
    ranked
      .withColumn("rank", r)
      .withColumn("ntile", ntileCol.cast("int"))
      .withColumn("percent_rank",
        when(n === 1, lit(0.0))
          .otherwise((r - 1).cast("double") / (n - 1).cast("double")))
      .withColumn("cume_dist", r.cast("double") / n.cast("double"))
      .drop("__bkt", "__og", "__ob", "__off", "__n", "__rank")
  }
}
