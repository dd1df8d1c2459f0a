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
    val want = Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1,
      10 -> 10, 11 -> 10, 12 -> 10, 20 -> 20, 21 -> 20)
    // driver union-find path (default threshold) and the distributed
    // min-label propagation path (threshold 0) must agree
    assert(Dedup.connectedComponents(edges).as[(Int, Int)].collect().toMap == want)
    assert(Dedup.connectedComponents(edges, localThreshold = 0)
      .as[(Int, Int)].collect().toMap == want)
  }

  test("local union-find survives a 100k-node chain without stack growth") {
    // worst case for a recursive find: one long chain, edges ordered so the
    // parent pointers form a deep path before any compression
    val n = 100000
    val edges = spark.range(1, n.toLong)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = Dedup.connectedComponents(edges) // n-1 edges < localThreshold
    assert(labels.count() === n.toLong)
    assert(labels.agg(countDistinct(col("label"))).head().getLong(0) === 1L)
    assert(labels.agg(min(col("label"))).head().getLong(0) === 1L)
  }

  test("connectedComponents on empty edges is empty") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Int, Int)].toDF("a", "b")).count() == 0)
  }

  test("contamination counts benchmark shingle hits per corpus doc") {
    val corpus = Seq(
      ("c1", "a b c d e"),   // 3 trigram shingles: abc bcd cde
      ("c2", "x y z w q"),   // no overlap with benchmark
      ("c3", "b c d e f"))   // shares "b c d", "c d e" with bench doc
      .toDF("doc_id", "text")
    val bench = Seq(("t1", "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, "doc_id", "text", shingleSize = 3)
      .orderBy("doc_id")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("c1", 3, 3L, 1.0), ("c2", 3, 0L, 0.0), ("c3", 3, 2L, 0.6667)))
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
