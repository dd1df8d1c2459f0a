package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("merge table is deterministic: classic low/lower corpus, ties break left-asc") {
    // freq: low ×3, lower ×2.
    // r1 pairs: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=2 → tie at 5, left asc → (l,o)
    // r2: (lo,w)=5 (w,e)=2 (e,r)=2 → (lo,w)
    // r3: (low,e)=2 (e,r)=2 → tie at 2, "e" < "low" → (e,r)
    val docs = Seq((1L, "low low LOW lower Lower")).toDF("doc_id", "text")
    val (merges, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 3)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("l", "o", 5L), ("lo", "w", 5L), ("e", "r", 2L)))
    val toks = Bpe.tokenCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("low" -> 1L, "lower" -> 2L)) // low | low er
  }

  test("64 rounds complete with bounded lineage; merges are the exact prefix ladder") {
    // one word of 65 distinct ascending chars (uppercase excluded — the
    // word table lowercases): every pair count is 1, so the tie-break
    // (count desc, left asc, right asc) always picks the pair whose left
    // symbol is the fused prefix (it starts with the smallest char) —
    // round r must merge (s1..sr, s(r+1)), 64 rounds to a single symbol
    val chars = (33 to 126).map(_.toChar).filterNot(_.isUpper).take(65)
    val word = chars.mkString
    val docs = Seq((1L, word)).toDF("doc_id", "text")
    val (merges, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 64)
    assert(merges.size == 64)
    merges.zipWithIndex.foreach { case (m, i) =>
      assert(m.left == chars.take(i + 1).mkString && m.pairCount == 1L
        && m.right == chars(i + 1).toString, s"round ${i + 1}: $m")
    }
    val toks = Bpe.tokenCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map(word -> 1L))
    // lineage bound (the O(R²) fix): the returned table's plan sits a
    // handful of nodes above the LAST re-persisted anchor, not 64
    // stacked replace projections over the original cache
    val plan = trained.queryExecution.optimizedPlan
    val nNodes = plan.collect { case p => p }.size
    assert(nNodes <= 10, s"plan has $nNodes nodes:\n$plan")
    assert(plan.collectFirst {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.nonEmpty, s"no cached anchor in plan:\n$plan")
  }

  test("train stops early when the corpus runs out of pairs") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text") // 1-char words only
    val (merges, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 5)
    assert(merges.isEmpty)
    val toks = Bpe.tokenCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("a" -> 1L, "b" -> 1L))
  }

  test("single-pass merge convention: run of 3 merges greedily, run of 4 leaves two singles") {
    // the documented deviation: one replace per round, so the shared
    // boundary separator blocks back-to-back matches in self-runs
    val docs = Seq((1L, "aaa aaa aaaa")).toDF("doc_id", "text")
    val (merges, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 1)
    // pairs: aaa contributes 2×2, aaaa contributes 3 → (a,a)=7
    assert(merges == Seq(Bpe.Merge("a", "a", 7L)))
    val toks = Bpe.tokenCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("aaa" -> 2L, "aaaa" -> 3L)) // (aa) a; (aa) a a
  }

  test("stored model round-trips; frozen merges tokenize OOV words") {
    val docs = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 3)
    val dir = "/tmp/graft/bpespec_model"
    Bpe.writeModel(spark, merges, dir)
    assert(Bpe.readModel(spark, dir) == merges)
    // OOV serve: "slower" was never trained on, but (l,o)(lo,w)(e,r)
    // still fire → s low er = 3; "glow" → g low = 2; "xyz" stays chars
    val oov = Seq((1L, "slower glow xyz")).toDF("doc_id", "text")
    val toks = Bpe.tokenCounts(
        Bpe.applyMerges(Bpe.wordTable(oov, "text"), Bpe.readModel(spark, dir)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("slower" -> 3L, "glow" -> 2L, "xyz" -> 3L))
  }

  test("corpusTokens: per-group whitespace vs trained subword counts") {
    val docs = Seq(
      ("feedA", "low low lower"),
      ("feedB", "lower low")).toDF("source", "text")
    val (_, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 3)
    val got = Bpe.corpusTokens(docs, "source", "text", Bpe.tokenCounts(trained))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // same merges as the low/lower fixture (freqs differ, winners don't):
    // low → 1 token, lower → 2
    assert(got == Seq(("feedA", 3L, 4L), ("feedB", 2L, 3L)))
  }
}
