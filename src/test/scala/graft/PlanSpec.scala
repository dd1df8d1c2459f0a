package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for scale-critical queries: the properties that
  * decide whether a plan survives a 100× scale-up (broadcast vs shuffle,
  * pushdown, no accidental nested loops) — pinned so a refactor that
  * silently degrades a plan fails CI, not the cluster.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q3: segment filter is pushed into the customer parquet scan") {
    val p = planOf("q3_top_orders")
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"), p.take(2000))
  }

  test("x42 contamination: benchmark index joins broadcast, never shuffles the corpus side") {
    val p = planOf("x42_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("x44 attribution: interval join keys on user_id equality, not a nested loop") {
    val p = planOf("x44_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("p2 projection: parquet scan reads only the projected columns") {
    val p = planOf("p2_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment"), readSchema)
  }

  test("j1 broadcast lookup: dimension side broadcasts") {
    val p = planOf("j1_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("x45 curation: the dedup semi-join never degrades to a loop join") {
    val p = planOf("x45_curation")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }
}
