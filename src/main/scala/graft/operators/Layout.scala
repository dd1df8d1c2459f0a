package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering for min/max
  * file skipping.
  *
  * A 100 TB table is pruned by its file-level min/max statistics, and
  * those are only tight for columns the data is SORTED by. A plain sort
  * gives perfect pruning on its leading column and none on any other;
  * the Morton (Z-order) key interleaves the bits of two columns so that
  * z-contiguous file ranges stay contained in BOTH dimensions — the
  * layout trick behind every "OPTIMIZE ... ZORDER BY" implementation.
  * Pruning becomes moderate on each clustered column instead of perfect
  * on one and nonexistent on the other — the right trade whenever more
  * than one column carries selective predicates.
  *
  * Everything here is plain bit arithmetic on longs (shift/and/or), so
  * the key is whole-stage-codegen'd in Spark and replayable by any SQL
  * engine from the same integers.
  */
object Layout {

  /** Morton/Z-order key of two non-negative ints: bit i of `x` lands at
    * output bit 2i, bit i of `y` at 2i+1. Inputs are masked to the low
    * `bits` bits first (callers bucket/clamp upstream — a hash or modulo
    * keeps arbitrary domains in range). Pure shift/and/or: codegen'd.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"zValue: bits=$bits out of [1,31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    val terms =
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i)) ++
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    terms.reduce(_.bitwiseOR(_))
  }

  /** The equivalent ANSI-SQL expression for [[zValue]] — generated from
    * the same (bits, positions) so engine and oracle can never disagree
    * about the interleave order.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits > 0 && bits <= 31, s"zValueSql: bits=$bits out of [1,31]")
    val mask = (1L << bits) - 1
    val terms =
      (0 until bits).map(i => s"((((($x) & $mask) >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"((((($y) & $mask) >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }

  /** Inverse interleave, driver-side (specs and audits): z → (x, y). */
  def unZValue(z: Long, bits: Int = 16): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Cluster `df` for two-column min/max pruning: range-partition on the
    * Morton key of (x, y) into `numPartitions` z-contiguous pieces and
    * sort each piece by it — the shape a `write.parquet` then lands as
    * one file per z-range, each file bounded in BOTH dimensions. One
    * range shuffle (sampling pass + exchange), same cost class as the
    * single-column sort it replaces. The key column is dropped: layout
    * is a storage concern, readers see the original schema.
    */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions > 0, s"zorderRepartition: bad n=$numPartitions")
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
