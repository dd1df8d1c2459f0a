package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("a"), None),
    (4L, Some("b"), Some(2.5)))
    .toDF("id", "s", "v")

  test("profile reports rows/nulls/distinct/min/max per column") {
    val p = Profile.profile(df, approx = false).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    assert(p("v") === ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("approx profile (the 100 TB default) keeps schema and exact row/null counts") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p.keySet === Set("id", "s", "v"))
    assert(p("s") === ((4L, 1L)))
  }

  test("approximate sketches stay within error bounds of exact (x38)") {
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val e = orders.agg(
      countDistinct(col("o_custkey")).as("d"),
      expr("percentile(o_totalprice, 0.5)").as("p50")).collect().head
    val a = orders.agg(
      approx_count_distinct(col("o_custkey"), 0.02).as("d"),
      expr("approx_percentile(o_totalprice, 0.5, 5000)").as("p50")).collect().head
    val (ed, ad) = (e.getLong(0).toDouble, a.getLong(0).toDouble)
    assert(math.abs(ad - ed) / ed < 0.05, s"HLL distinct $ad vs exact $ed")
    val (ep, ap) = (e.getDouble(1), a.getDouble(1))
    assert(math.abs(ap - ep) / ep < 0.02, s"approx p50 $ap vs exact $ep")
  }

  test("keySkew surfaces the hot key with share and skew factor") {
    // 90 rows of key 1 + one row each of keys 2..11: total 100, 11 keys
    val df = (Seq.fill(90)(1) ++ (2 to 11)).toDF("k")
    val top = graft.operators.Profile.keySkew(df, "k", k = 3)
      .orderBy(col("n").desc, col("key")).collect()
    assert(top.length === 3)
    val hot = top.head
    assert(hot.getInt(0) === 1 && hot.getLong(1) === 90L)
    assert(hot.getDouble(2) === 0.9)          // share
    assert(hot.getDouble(3) === 9.9)          // 90 / (100/11 uniform)
    assert(top(1).getLong(1) === 1L)          // the cold keys
  }
}
