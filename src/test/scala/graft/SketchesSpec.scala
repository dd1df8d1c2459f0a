package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def items = Seq(
    "a", "a", "a", "a", "b", "b", "b", "c", "c", "d", "e", "e", "e", "e", "e")
    .toDF("tok")

  private def truth = items.groupBy($"tok").agg(count(lit(1)).as("n"))

  test("cmsEstimate never undercounts (one-sided guarantee)") {
    val sketch = Sketches.cmsBuild(items, "tok", depth = 3, width = 4)
    val est = Sketches.cmsEstimate(truth, "tok", sketch, depth = 3, width = 4)
    est.collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n"),
        s"undercount for ${r.getAs[String]("tok")}")
    }
  }

  test("wide sketch is exact (no collisions possible to matter)") {
    val sketch = Sketches.cmsBuild(items, "tok", depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(truth, "tok", sketch, depth = 4, width = 1024)
    est.collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") === r.getAs[Long]("n"),
        s"wide-sketch mismatch for ${r.getAs[String]("tok")}")
    }
  }

  test("sketch table is bounded by depth x width") {
    val sketch = Sketches.cmsBuild(items, "tok", depth = 3, width = 4)
    assert(sketch.count() <= 3L * 4L)
    // every counter names a valid (r, b)
    sketch.collect().foreach { r =>
      assert(r.getAs[Int]("r") >= 0 && r.getAs[Int]("r") < 3)
      assert(r.getAs[Long]("b") >= 0 && r.getAs[Long]("b") < 4)
    }
  }

  test("cmsMerge of split halves equals the sketch of the whole (linearity)") {
    val h1 = items.limit(7)
    val h2 = items.exceptAll(h1)
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(h1, "tok", depth = 3, width = 4),
      Sketches.cmsBuild(h2, "tok", depth = 3, width = 4))
      .withColumn("c", $"c".cast("long"))
    val whole = Sketches.cmsBuild(items, "tok", depth = 3, width = 4)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("md5 hasher path: same guarantees, exact on a wide sketch") {
    val sk = Sketches.cmsBuild(items, "tok", depth = 3, width = 4,
      hasher = Sketches.md5Bucket)
    val est = Sketches.cmsEstimate(truth, "tok", sk, depth = 3, width = 4,
      hasher = Sketches.md5Bucket)
    est.collect().foreach(r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n")))
    val wide = Sketches.cmsBuild(items, "tok", depth = 3, width = 1024,
      hasher = Sketches.md5Bucket)
    Sketches.cmsEstimate(truth, "tok", wide, depth = 3, width = 1024,
        hasher = Sketches.md5Bucket)
      .collect().foreach(r =>
        assert(r.getAs[Long]("cms_est") === r.getAs[Long]("n")))
  }

  test("total sketch mass per row equals the item count") {
    val sketch = Sketches.cmsBuild(items, "tok", depth = 3, width = 4)
    val perRow = sketch.groupBy($"r").agg(sum($"c").as("mass")).collect()
    assert(perRow.length === 3)
    perRow.foreach(r => assert(r.getAs[Long]("mass") === 15L))
  }

  test("hllGroupSketches: small distinct sets estimate exactly") {
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "c"), ("g2", "d"), ("g2", "d"))
      .toDF("g", "item")
    val got = Sketches.hllGroupSketches(df, "g", "item")
      .select($"g", Sketches.hllEstimate($"hll").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("g1" -> 2L, "g2" -> 3L))
  }

  test("hllUnionEstimate: union of group sketches counts the global distinct set") {
    val df = Seq(
      ("g1", "a"), ("g1", "b"),
      ("g2", "b"), ("g2", "c")) // 'b' shared — union must not double count
      .toDF("g", "item")
    val sk = Sketches.hllGroupSketches(df, "g", "item")
    val est = Sketches.hllUnionEstimate(sk.select($"hll"))
      .collect()(0).getLong(0)
    assert(est === 3L)
  }
}
