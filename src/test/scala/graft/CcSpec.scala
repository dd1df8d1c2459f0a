package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class CcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("connectedComponents labels chains, cliques, and separates islands") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // clique 10-11-12, separate pair 20-21
    val edges = Seq((2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
      (20, 21)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges).as[(Int, Int)]
      .collect().toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1,
      10 -> 10, 11 -> 10, 12 -> 10, 20 -> 20, 21 -> 20))
  }

  test("connectedComponents on empty edges is empty") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Int, Int)].toDF("a", "b")).count() == 0)
  }

  test("clusters: near-dups share a label, singletons label themselves") {
    val docs = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog again and again"),
      ("d2", "the quick brown fox jumps over the lazy dog again and again"),
      ("d3", "an entirely different document about spark query planning"),
      ("d4", "spark catalyst optimizes logical plans into physical plans"))
      .toDF("doc_id", "text")
    val got = Dedup.clusters(docs, "doc_id", "text", threshold = 0.9)
      .as[(String, String)].collect().toMap
    assert(got == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d3", "d4" -> "d4"))
  }
}
