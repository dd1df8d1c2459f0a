package graft

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
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    assert(p("v") === ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("approx profile keeps the schema and exact row/null counts") {
    val p = Profile.profile(df, approx = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p.keySet === Set("id", "s", "v"))
    assert(p("s") === ((4L, 1L)))
  }
}
