package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz

/** Data-profiling pass: per-column row/null/distinct counts and min/max,
  * in ONE scan — the data-quality report a training-data pipeline runs
  * before trusting a new drop of documents.
  *
  * Shape: a single wide aggregate (Spark plans the multiple distinct
  * aggregates with one Expand — still one scan, one shuffle) followed by a
  * driver-side unpivot of the 1-row result into (column, metric...) rows.
  * The only `collect()` is that single profile row — O(#columns), never
  * data-sized.
  *
  * At 100 TB exact per-column distinct counts are the expensive part: the
  * multi-distinct Expand emits one row per column per input row. The
  * default is therefore `approx = true` — HyperLogLog++
  * (`approx_count_distinct`, ~2% standard error) in a single
  * constant-memory pass, same output schema. Exact counts are the opt-in
  * for dim-sized tables (the x21 oracle query uses them).
  */
object Profile {

  def profile(df: DataFrame, approx: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getAs[Long]("__total")
    val out = cols.map { c =>
      (c, total, total - row.getAs[Long](s"__cnt_$c"), row.getAs[Long](s"__dst_$c"),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }
    out.toDF("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Key-skew diagnostic: the `k` heaviest values of a key column, each
    * with its row share and skew factor (count ÷ the count a perfectly
    * uniform key distribution would give). The pre-flight check before
    * choosing join/aggregation keys at scale — skew ≳ partition-count
    * means one task absorbs the key and the plan needs salting
    * (`RelOps.saltedJoin`) or AQE skew handling.
    *
    * One count aggregation by key (map-side partial agg), a 1-row totals
    * frame, and a TakeOrdered top-k — the driver never holds more than k
    * rows plus the totals.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.orderBy(col("n").desc, col("key")).limit(k)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        roundz(col("n") / col("__total"), 6).as("share"),
        // n and nkeys are both data-sized longs — multiply in double space
        // or the very skew this diagnostic exists to catch overflows it
        roundz(col("n").cast("double") * col("__nkeys") / col("__total"), 4).as("skew"))
  }
}
