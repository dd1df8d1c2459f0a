package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

class RanksSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("rankFamily matches Spark's window functions exactly on orders") {
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    val naive = orders.select($"o_orderkey",
      row_number().over(w).as("rank"),
      ntile(4).over(w).as("ntile"),
      percent_rank().over(w).as("percent_rank"),
      cume_dist().over(w).as("cume_dist"))
    val fast = Ranks.rankFamily(orders, "o_orderpriority",
      Seq("o_totalprice", "o_orderkey"), ntileN = 4)
      .select($"o_orderkey", $"rank", $"ntile", $"percent_rank", $"cume_dist")
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty,
      "two-pass rank family diverged from Spark's window functions")
    assert(fast.count() === orders.count())
  }

  test("rankFamily fails loudly past the maxGroups driver-memory contract") {
    val wide = spark.range(50)
      .select($"id".as("g"), $"id".as("v"))
    val e = intercept[IllegalArgumentException] {
      Ranks.rankFamily(wide, "g", Seq("v"), maxGroups = 10)
    }
    assert(e.getMessage.contains("more than 10 distinct 'g' groups"))
    assert(e.getMessage.contains("Window.partitionBy"))
  }

  test("rankFamily -0.0/0.0 double group keys stay one group (IEEE normalization)") {
    // groupBy/Window treat -0.0 == 0.0; the string-keyed driver maps must
    // agree or offsets double-count within the merged window partition
    val df = Seq((-0.0, 1L), (0.0, 2L), (0.0, 3L)).toDF("g", "v")
    val out = Ranks.rankFamily(df, "g", Seq("v"))
      .select($"v", $"rank").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("rankFamily handles tiny, 1-row, and NULL groups (and N < ntileN)") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 20.0, 3L), // tie on lead col
      ("b", 5.0, 4L),                                    // 1-row group
      ("c", 1.0, 5L), ("c", 2.0, 6L),                    // N < ntileN
      (null, 7.0, 7L), (null, 3.0, 8L))                  // null group: a group, not dropped
      .toDF("g", "price", "k")
    val w = Window.partitionBy($"g").orderBy($"price", $"k")
    val naive = df.select($"k",
      row_number().over(w).as("rank"),
      ntile(4).over(w).as("ntile"),
      percent_rank().over(w).as("percent_rank"),
      cume_dist().over(w).as("cume_dist"))
    val fast = Ranks.rankFamily(df, "g", Seq("price", "k"), ntileN = 4,
      nBuckets = 2)
      .select($"k", $"rank", $"ntile", $"percent_rank", $"cume_dist")
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty)
  }

  test("rankFamily parallelism: window stage partitions by (group, bucket)") {
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val fast = Ranks.rankFamily(orders, "o_orderpriority",
      Seq("o_totalprice", "o_orderkey"), ntileN = 4, nBuckets = 8)
    // the plan's window operator must key on both group and bucket — that
    // is the whole point (5 groups alone would mean 5 sort tasks)
    val plan = fast.queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), plan.take(2000))
  }

  test("rankFamily survives a group whose leading sort column is all null") {
    // approx_percentile of an all-null group returns a NULL boundary
    // array; the coalesce-to-empty fold must put those rows in bucket 0
    // instead of crashing the typed counts collect
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", Some(2.0), 2L),
      ("b", Option.empty[Double], 3L), ("b", Option.empty[Double], 4L))
      .toDF("g", "v", "id")
    val out = Ranks.rankFamily(df, "g", Seq("v", "id"), ntileN = 2, nBuckets = 4)
      .select($"g", $"id", $"rank").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L), ("b", 4L, 2L)))
  }
}
