package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Training

class TrainingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("hashSplit is deterministic, complete, and key-only") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val a = Training.hashSplit(docs.select($"doc_id"), "doc_id")
    val b = Training.hashSplit(docs.select($"doc_id"), "doc_id")
    // re-run assigns every key identically (no RNG anywhere)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every row lands in exactly one split, buckets stay in [0, 100)
    val splits = a.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(splits.values.sum === docs.count())
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(a.where($"bucket" < 0 || $"bucket" >= 100).isEmpty)
    // roughly proportional at 500 docs (md5 is uniform; generous bounds)
    assert(splits("train") > 300, splits.toString)
    // known-value pin: bucket(key) = int(md5(str(key))[:8], 16) % 100
    val k0 = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("0".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16) % 100
    assert(a.where($"doc_id" === 0).select($"bucket").as[Long].head() === k0)
  }

  test("packSequences chops the per-shard token stream at budget boundaries") {
    val docs = Seq(
      (0L, 100L), (8L, 100L), (16L, 100L), (24L, 100L), // shard 0
      (1L, 300L), (9L, 10L))                            // shard 1
      .toDF("doc_id", "n_tokens")
    val out = Training.packSequences(docs, "doc_id", "n_tokens",
        budget = 256, nShards = 8)
      .select($"doc_id", $"shard", $"start_tok", $"seq_id", $"seq_off")
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, 0, 0L, 0L, 0L),     // [0, 100)
      (1L, 1, 0L, 0L, 0L),     // shard 1: [0, 300) spans the boundary
      (8L, 0, 100L, 0L, 100L), // [100, 200)
      (9L, 1, 300L, 1L, 44L),  // starts inside seq 1 of shard 1
      (16L, 0, 200L, 0L, 200L),// [200, 300) starts in seq 0
      (24L, 0, 300L, 1L, 44L)))
  }

  test("packSequences start offsets are gapless per shard on real documents") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select($"doc_id",
        graft.functions.TextStats.tokenCount($"text").cast("long").as("n_tokens"))
    val out = Training.packSequences(docs, "doc_id", "n_tokens",
      budget = 256, nShards = 8)
    // within each shard the stream is contiguous: next start = start + len
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
    val gaps = out.withColumn("prev_end",
        lag($"start_tok" + $"n_tokens", 1, 0L).over(w))
      .where($"start_tok" =!= $"prev_end")
    assert(gaps.isEmpty)
  }

  test("globalHashRank equals the single-partition-window rank, no gaps") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select("doc_id")
    val ranked = Training.globalHashRank(docs, "doc_id", seed = 7L)
    // dense 1..n: the offsets pass stitched the partitions seamlessly
    val n = docs.count()
    val agg = ranked.agg(min(col("rank")), max(col("rank")),
      countDistinct(col("rank"))).collect().head
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n)
    // exactly the rank a global sort would give (reference: explicit
    // 1-partition window over the same (hash, key) order)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(xxhash64(lit(7L), col("doc_id")), col("doc_id"))
    val want = docs.withColumn("want", row_number().over(w))
    val mismatches = ranked.join(want, "doc_id")
      .where(col("rank") =!= col("want")).count()
    assert(mismatches == 0L)
    spark.catalog.clearCache()
  }

  test("balancedShards: exact ±1 balance, deterministic, covers the corpus") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val k = 7
    val sharded = Training.balancedShards(docs, "doc_id", nShards = k).persist()
    val n = docs.count()
    val sizes = sharded.groupBy(col("shard")).count()
      .orderBy(col("shard")).as[(Int, Long)].collect()
    assert(sizes.map(_._1).toSeq == (0 until k))
    // shard s holds n/k rows, +1 for s < n mod k — exact, not expected
    sizes.foreach { case (s, c) =>
      assert(c == n / k + (if (s < n % k) 1L else 0L), s"shard $s size $c")
    }
    assert(sizes.map(_._2).sum == n)
    // pure function of (seed, key): a re-run reproduces every assignment
    val again = Training.balancedShards(docs, "doc_id", nShards = k)
    assert(sharded.select("doc_id", "shard").exceptAll(
      again.select("doc_id", "shard")).count() == 0L)
    sharded.unpersist()
    spark.catalog.clearCache()
  }

  test("capPerGroup bounds every group and keeps the lowest-ordered rows") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 4L), // capped to first 2 by id
      ("b", 9L))                                  // under the cap → all kept
      .toDF("g", "id")
    val out = Training.capPerGroup(df, Seq("g"), Seq("id"), maxPerGroup = 2)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 9L)))
    // the plan keeps the partial group-limit below the exchange (the scale
    // property: skewed groups are cut map-side, not at 5 reducers)
    val plan = Training.capPerGroup(
        spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet"),
        Seq("source"), Seq("doc_id"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan.take(2000))
  }

  test("repetitionStats flags repetitious documents, passes diverse ones") {
    val docs = Seq(
      (1L, "spam spam spam spam"),            // top_frac 1.0, dup 0.75
      (2L, "all tokens here are different"),  // dup 0, top 0.2
      (3L, "a a b b c c d d e e"))            // dup 0.5, top 0.2
      .toDF("doc_id", "text")
    val out = Training.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 0.75, 1.0, false)))
    assert(out(1) === ((2L, 0.0, 0.2, true)))
    assert(out(2) === ((3L, 0.5, 0.2, true)))
  }

  test("sampleNPerGroup: exact n per group, deterministic, differs from first-n") {
    val df = (1L to 100L).map(i => (i, s"g${i % 2}")).toDF("id", "g")
    val s1 = Training.sampleNPerGroup(df, Seq("g"), "id", 10)
      .as[(Long, String)].collect().toSet
    assert(s1.size === 20)
    assert(s1.groupBy(_._2).forall(_._2.size === 10))
    // reproducible run-to-run
    val s2 = Training.sampleNPerGroup(df, Seq("g"), "id", 10)
      .as[(Long, String)].collect().toSet
    assert(s1 === s2)
    // and NOT the first-n rows (md5 order ≠ id order)
    val firstN = Training.capPerGroup(df, Seq("g"), Seq("id"), 10)
      .as[(Long, String)].collect().toSet
    assert(s1 !== firstN)
    // requesting more than the group holds returns the whole group
    val all = Training.sampleNPerGroup(df, Seq("g"), "id", 1000).count()
    assert(all === 100L)
  }

  test("weightedSampleNPerGroup: deterministic, n per group, weights matter") {
    val df = (1L to 200L).map(i => (i, s"g${i % 2}", if (i <= 100L) 1000.0 else 0.001))
      .toDF("id", "g", "w")
    val s1 = Training.weightedSampleNPerGroup(df, Seq("g"), "id", "w", 10)
      .as[(Long, String, Double)].collect().toSet
    assert(s1.size === 20)
    assert(s1.groupBy(_._2).forall(_._2.size === 10))
    // reproducible
    val s2 = Training.weightedSampleNPerGroup(df, Seq("g"), "id", "w", 10)
      .as[(Long, String, Double)].collect().toSet
    assert(s1 === s2)
    // heavy weights dominate: u^(1/1000) ≈ 1 vs u^(1000) ≈ 0, so every
    // selected row should come from the heavy half
    assert(s1.forall(_._1 <= 100L), s"light-weight rows leaked into: $s1")
    // and unlike the unweighted sampler, the selection respects weights
    val unweighted = Training.sampleNPerGroup(df, Seq("g"), "id", 10)
      .as[(Long, String, Double)].collect().toSet
    assert(s1 !== unweighted)
  }

  test("cluster-keyed hashSplit keeps every near-dup group on one side") {
    // the leakage-safe composition (x81): split by group key → members of
    // a group can never straddle train/test
    val df = (1L to 100L).map(i => (i, s"c${i % 7}")).toDF("id", "cluster_id")
    val split = Training.hashSplit(df, "cluster_id")
    val perCluster = split.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n")).select($"n").as[Long].collect()
    assert(perCluster.forall(_ == 1L), "a cluster straddled splits")
    // and the same rows split by row id DO straddle (the guard matters)
    val rowKeyed = Training.hashSplit(df, "id")
    val straddling = rowKeyed.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n")).where($"n" > 1).count()
    assert(straddling > 0)
  }

  test("tokenBudgetMix keeps whole docs in md5 order until the budget spends") {
    val df = (1L to 40L).map(i => (i, s"s${i % 2}", 10L)).toDF("id", "src", "tok")
    // budget 55 → cum-before < 55 keeps docs at offsets 0,10,20,30,40,50:
    // exactly 6 docs of 10 tokens (overshoot by one doc allowed)
    val out = Training.tokenBudgetMix(df, "src", "id", "tok",
      Map("s0" -> 55L, "s1" -> 0L))
    val kept = out.as[(Long, String, Long)].collect()
    assert(kept.forall(_._2 == "s0"), "zero-budget source must keep nothing")
    assert(kept.length === 6)
    // deterministic md5 order: the kept set is the 6 smallest md5 ranks
    val expect = (1L to 40L).filter(_ % 2 == 0)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(6).toSet
    assert(kept.map(_._1).toSet === expect)
    // absent source: dropped entirely
    val none = Training.tokenBudgetMix(df, "src", "id", "tok", Map("zz" -> 100L))
    assert(none.count() === 0)
  }

  test("temperatureMix: alpha=1 is the flat gate, alpha=0 boosts rare sources") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    // alpha=1 → w_s ∝ n_s → every source's rate is exactly targetFraction
    val a1 = Training.temperatureMix(df, "source", "doc_id",
      alpha = 1.0, targetFraction = 0.4)
    val flat = graft.operators.RelOps.stratifiedHashSample(df, "doc_id", "source",
      Map("src0" -> 0.4, "src1" -> 0.4, "src2" -> 0.4))
    assert(a1.collect().toSet === flat.collect().toSet)
    // alpha=0 → uniform source weights: the rare source's rate clamps to 1
    // (every doc kept), the head is sampled well below its natural share
    val skew = ((0L until 900L).map(i => (i, "big"))
      ++ (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val mixed = Training.temperatureMix(skew, "source", "doc_id",
      alpha = 0.0, targetFraction = 0.5)
    val bySrc = mixed.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") === 100L, s"rare source not fully kept: $bySrc")
    assert(bySrc("big") < 400L, s"head not downsampled: $bySrc")
    // determinism + empty input
    assert(mixed.collect().toSet === Training.temperatureMix(skew, "source",
      "doc_id", alpha = 0.0, targetFraction = 0.5).collect().toSet)
    assert(Training.temperatureMix(skew.limit(0), "source", "doc_id",
      alpha = 0.5, targetFraction = 0.5).count() === 0)
  }

  test("groupPortableRank: dense 1..n per group, ordered by the portable md5") {
    val df = (0L until 200L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val got = Training.groupPortableRank(df, "id", "g")
      .select($"g", $"id", $"rank").as[(String, Long, Long)].collect()
    val byG = got.groupBy(_._1)
    assert(byG.size === 4)
    for ((_, rows) <- byG) {
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
      // rank order = local md5-hash order
      val md5 = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long) = md5.digest(s"42|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = rows.map(_._2).sortBy(id => (h(id), id))
      assert(rows.sortBy(_._3).map(_._2).toSeq === want.toSeq)
    }
  }

  test("interleaveBySource rotates sources strictly and survives repartition") {
    val df = (0L until 120L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val out = Training.interleaveBySource(df, "id", "src")
      .orderBy($"global_pos")
      .select($"global_pos", $"src").as[(Long, String)].collect()
    // equal-size sources: positions are dense 0..n-1 and rotate s0,s1,s2
    assert(out.map(_._1).toSeq === (0L until 120L).toSeq)
    assert(out.forall { case (p, s) => s === s"s${p % 3}" })
    // deterministic under physical layout changes
    val re = Training.interleaveBySource(df.repartition(13), "id", "src")
      .orderBy($"global_pos").select($"global_pos", $"src")
      .as[(Long, String)].collect()
    assert(re.toSeq === out.toSeq)
  }

  test("interleaveBySource: an exhausted source leaves gaps, rotation continues") {
    val df = (Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))).toDF("id", "src")
    val out = Training.interleaveBySource(df, "id", "src")
      .orderBy($"global_pos")
      .select($"global_pos", $"src").as[(Long, String)].collect().toSeq
    // a at even positions 0,2,4; b only at position 1, then absent
    assert(out.map(_._2) === Seq("a", "b", "a", "a"))
    assert(out.map(_._1) === Seq(0L, 1L, 2L, 4L))
  }
}
