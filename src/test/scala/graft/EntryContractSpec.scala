package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. */
class EntryContractSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { if (fn(spark, SparkTestSession.sfDir).count() > 0) None else Some(s"$name: 0 rows") }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
