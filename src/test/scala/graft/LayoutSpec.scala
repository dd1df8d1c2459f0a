package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("zValue ↔ unZValue round-trip over a full small domain, quadrant prefixes") {
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), bits = 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(Layout.unZValue(z, bits = 5) == ((x, y)), s"($x,$y) z=$z")
    }
    // bijective over the domain
    assert(got.map(_._3).distinct.length == pts.length)
    // top two of the 10 z-bits = quadrant (y-high at bit 9, x-high at 8)
    got.foreach { case (x, y, z) =>
      assert((z >> 8) == ((y >> 4) << 1 | (x >> 4)), s"($x,$y) z=$z")
    }
  }

  test("masking: inputs beyond `bits` wrap like a modulo, never corrupt neighbors") {
    val z1 = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 4)).as[Long].head()
    val z2 = Seq((3L + 16L, 5L + 32L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 4)).as[Long].head()
    assert(z1 == z2)
  }

  test("zorderRepartition bounds BOTH dimensions; an x-sort cannot prune a y predicate") {
    // deterministic 64x64 grid, one row per cell
    val grid = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64))
      .toDF("x", "y")
    def partitionBounds(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zparts = partitionBounds(
      Layout.zorderRepartition(grid, col("x"), col("y"), numPartitions = 16, bits = 6))
    val xparts = partitionBounds(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    assert(zparts.length == 16 && xparts.length == 16)
    // a file-skipping reader keeps only partitions whose min/max intersects
    // the predicate; y IN [0,15] must prune most z-parts and NO x-parts
    def hitY(b: (Long, Long, Long, Long)) = b._3 <= 15 && b._4 >= 0
    val zHits = zparts.count(hitY)
    val xHits = xparts.count(hitY)
    assert(xHits == 16, s"x-sorted layout prunes nothing on y (got $xHits)")
    assert(zHits <= 8, s"z-layout must bound y per partition (got $zHits/16 hits)")
    // and the z-layout still prunes on x too (moderate-on-both trade)
    def hitX(b: (Long, Long, Long, Long)) = b._1 <= 15 && b._2 >= 0
    assert(zparts.count(hitX) <= 8)
  }
}
