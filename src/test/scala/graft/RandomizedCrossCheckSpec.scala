package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Bpe, Checks, Dedup, Graph, RelOps, Temporal, Transpose}
import graft.sources.Catalog

/** Randomized (fixed-seed, deterministic) cross-checks: each operator is
  * compared against an independent brute-force formulation on generated
  * data — the correctness net for input shapes no hand-written fixture
  * thought of (duplicate timestamps, absent keys, null cells, skew).
  */
class RandomizedCrossCheckSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("asofJoinBackward equals brute-force latest-at-or-before on random data") {
    val rnd = new scala.util.Random(20240812L)
    // keys 0..4; right side deliberately missing key 4; duplicate ts included
    val rightRows = Seq.tabulate(60)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, s"v$i"))
    val leftRows = Seq.tabulate(80)(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong))
    val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "t")
    val right = rightRows.toDF("k", "rt", "payload")

    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "t", "rt",
        payload = Seq("payload"))
      .select($"lid", $"asof_rt", $"asof_payload")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2)))))
      .toMap

    // brute force: for each left row, the right row with max rt <= t; the
    // window breaks payload ties by union order, so compare rt only (and
    // payload just when the (k, rt) pair is unique)
    val rightByKey = rightRows.groupBy(_._1)
    leftRows.zipWithIndex.foreach { case ((k, t), i) =>
      val candidates = rightByKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val (gotRt, gotPayload) = got(i.toLong)
      if (candidates.isEmpty) {
        assert(gotRt.isEmpty && gotPayload.isEmpty, s"lid=$i expected no match")
      } else {
        val bestRt = candidates.map(_._2).max
        assert(gotRt.contains(bestRt), s"lid=$i k=$k t=$t: rt $gotRt != $bestRt")
        val tied = candidates.filter(_._2 == bestRt)
        if (tied.size == 1) assert(gotPayload.contains(tied.head._3), s"lid=$i")
      }
    }
    assert(got.size === leftRows.size) // as-of never drops or duplicates left rows
  }

  test("funnel equals a brute-force per-user chain scan on random data") {
    val rnd = new scala.util.Random(99L)
    val types = Seq("view", "click", "buy", "noise")
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(40).toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L),
        types(rnd.nextInt(types.length))))
    val events = rows.toDF("user_id", "ts", "event_type")
    val stages = Seq("view", "click", "buy")
    val got = graft.operators.Behavior.funnel(events, stages)
      .orderBy("stage_idx").as[(Int, String, Long)].collect().map(_._3).toSeq

    // brute force: walk each user's (ts, type) history sorted like the
    // operator (ts asc, then type asc as the struct-sort tiebreak)
    val expected = Array.fill(3)(0L)
    rows.groupBy(_._1).foreach { case (_, es) =>
      val hist = es.map(e => (e._2.getTime, e._3)).sortBy(identity)
      var reached = Array.fill[Option[Long]](3)(None)
      hist.foreach { case (t, ty) =>
        val i = stages.indexOf(ty)
        if (i >= 0 && reached(i).isEmpty &&
          (i == 0 || reached(i - 1).exists(_ < t))) reached(i) = Some(t)
      }
      reached.zipWithIndex.foreach { case (r, i) => if (r.isDefined) expected(i) += 1 }
    }
    assert(got === expected.toSeq, s"got $got expected ${expected.toSeq}")
  }

  test("scd2Merge equals the full rebuild on random change logs") {
    val rnd = new scala.util.Random(20260813L)
    // random keys/values with duplicate timestamps resolved by event_id;
    // split at a time threshold (the operator's append-only contract)
    val rows = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(1000) * 1000L),
        i.toLong,
        s"v${rnd.nextInt(4)}"))
      .toDF("k", "ts", "event_id", "v")
    val cut = new java.sql.Timestamp(1704067200000L + 600 * 1000L)
    val existing = Temporal.scd2(rows.where($"ts" < cut), Seq("k"), "ts",
      Seq("v"), tieBreak = Seq("event_id"))
    val merged = Temporal.scd2Merge(existing, rows.where($"ts" >= cut),
        Seq("k"), "ts", Seq("v"), tieBreak = Seq("event_id"))
      .select($"k", $"v", $"eff_from", $"eff_to", $"is_current")
    val full = Temporal.scd2(rows, Seq("k"), "ts", Seq("v"),
        tieBreak = Seq("event_id"))
      .select($"k", $"v", $"eff_from", $"eff_to", $"is_current")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "random incremental merge diverged from the full rebuild")
  }

  test("tokenBudgetMix equals the naive serial-window formulation on random data") {
    val rnd = new scala.util.Random(31337L)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, s"s${rnd.nextInt(5)}", (rnd.nextInt(40) + 1).toLong))
    val df = rows.toDF("id", "src", "tok")
    val budgets = Map("s0" -> 120L, "s1" -> 1L, "s2" -> 0L, "s3" -> 100000L)
    val got = graft.operators.Training
      .tokenBudgetMix(df, "src", "id", "tok", budgets)
      .select($"id").as[Long].collect().toSet
    // naive: per source, md5-rank order, keep while running total-before
    // stays under budget — computed locally
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = rows.groupBy(_._2).flatMap { case (src, rs) =>
      val budget = budgets.getOrElse(src, -1L)
      var cum = 0L
      rs.sortBy(r => (md5hex(r._1.toString), r._1)).flatMap { r =>
        val keep = cum < budget
        cum += r._3
        if (keep) Some(r._1) else None
      }
    }.toSet
    assert(got === expect,
      s"bucketed mix diverged: extra=${got -- expect} missing=${expect -- got}")
  }

  test("weightedSampleNPerGroup equals a local priority computation on random data") {
    val rnd = new scala.util.Random(4242L)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextDouble() * 100 + 0.5))
    val df = rows.toDF("id", "g", "w")
    val got = graft.operators.Training
      .weightedSampleNPerGroup(df, Seq("g"), "id", "w", 7)
      .select($"id").as[Long].collect().toSet
    // local replay of the exact formula: u from the first 8 md5 hex chars,
    // priority = round(u^(1/w), 9), top-7 per group (priority desc, id asc)
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    val expect = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map(r => (r._1, BigDecimal(math.pow(u(r._1), 1.0 / r._3))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, p) => (-p, id) }
        .take(7).map(_._1)
    }.toSet
    assert(got === expect,
      s"weighted sample diverged: extra=${got -- expect} missing=${expect -- got}")
  }

  test("importanceWeights equals a local two-LM computation on random corpora") {
    val rnd = new scala.util.Random(777L)
    val vocabPool = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc() = Seq.fill(1 + rnd.nextInt(12))(vocabPool(rnd.nextInt(vocabPool.size)))
    val srcRows = Seq.tabulate(40)(i => (i.toLong, doc().mkString(" "))) :+ (40L, "")
    val tgtRows = Seq.tabulate(8)(i => (100L + i, doc().mkString(" ")))
    val got = graft.functions.TextStats.importanceWeights(
        srcRows.toDF("doc_id", "text"), tgtRows.toDF("doc_id", "text"),
        "doc_id", "text", vocabSize = 6)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // local replay: top-6 vocab (count desc, token asc), denom n+v+1, avg ratio
    def lm(rows: Seq[(Long, String)]): (Map[String, Long], Double) = {
      val toks = rows.flatMap(_._2.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(6).toMap
      (top, (toks.size + top.size + 1).toDouble)
    }
    val (sv, sd) = lm(srcRows)
    val (tv, td) = lm(tgtRows)
    srcRows.foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) assert(got(id).isEmpty, s"doc $id: tokenless must be null")
      else {
        val exp = toks.map(t =>
          math.log10((tv.getOrElse(t, 0L) + 1) / td) -
            math.log10((sv.getOrElse(t, 0L) + 1) / sd)).sum / toks.size
        assert(math.abs(got(id).get - exp) < 1e-12, s"doc $id")
      }
    }
  }

  test("dedupKeepBest invariants on random clusters: one survivor per cluster, best wins") {
    val rnd = new scala.util.Random(31337L)
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, s"text $i", rnd.nextInt(100))).toDF("doc_id", "text", "score")
    // random precomputed clusters over a SUBSET of docs (0..39); 40..49 absent
    val clusterOf = (0L until 40L).map(id => id -> (id % 7)).toMap
    val cl = clusterOf.toSeq.toDF("doc_id", "cluster_id")
    val kept = graft.operators.Dedup.dedupKeepBest(docs, "doc_id", "text",
        "score", threshold = 0.9, precomputedClusters = Some(cl))
      .select($"doc_id").as[Long].collect().toSet
    // absent docs are singletons: all survive
    assert((40L until 50L).forall(kept.contains), "absent-from-clusters docs must survive")
    // each cluster keeps exactly its (max score, min id) member
    val scores = docs.select($"doc_id", $"score").as[(Long, Int)].collect().toMap
    (0L until 7L).foreach { c =>
      val members = clusterOf.collect { case (id, cc) if cc == c => id }.toSeq
      val best = members.map(id => (id, scores(id)))
        .sortBy { case (id, s) => (-s, id) }.head._1
      assert(kept.intersect(members.toSet) === Set(best), s"cluster $c")
    }
  }

  test("WAV synth/decode round-trips exact counts and analytic RMS over random seeds") {
    val rnd = new scala.util.Random(555L)
    (1 to 15).foreach { _ =>
      val seed = rnd.nextLong()
      val durationMs = (1 + rnd.nextInt(20)) * 100L
      val wav = graft.operators.Multimodal.synthWav(seed, durationMs)
      val (samples, rate) = graft.operators.Multimodal.decodeWav(wav)
        .getOrElse(fail(s"seed=$seed did not decode"))
      assert(rate === 4000.0f)
      assert(samples.length === (durationMs * 4).toInt, s"seed=$seed ms=$durationMs")
      val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
      assert(math.abs(rms - graft.operators.Multimodal.ampFor(seed) / math.sqrt(2.0)) < 1e-3,
        s"seed=$seed")
    }
  }

  test("AVI synth/decode round-trips frame counts, header facts, and per-frame luma over random seeds") {
    val rnd = new scala.util.Random(777L)
    (1 to 10).foreach { _ =>
      val seed = rnd.nextLong()
      val durationMs = (1 + rnd.nextInt(8)) * 1000L
      val fps = 1 + rnd.nextInt(4)
      val avi = graft.operators.Multimodal.synthAvi(seed, durationMs, fps)
      val v = graft.operators.Multimodal.decodeAvi(avi)
        .getOrElse(fail(s"seed=$seed did not decode"))
      assert(v.frames.length === math.max((durationMs * fps / 1000L).toInt, 1),
        s"seed=$seed fps=$fps")
      assert(v.microSecPerFrame === 1000000 / fps)
      v.frames.zipWithIndex.foreach { case (f, i) =>
        val img = graft.operators.Multimodal.decodeImage(f)
          .getOrElse(fail(s"seed=$seed frame $i not decodable"))
        val luma = graft.operators.Multimodal.imageFeatures(img, 4)(3)
        val expected = graft.operators.Multimodal.frameGray(seed, i) / 255.0
        assert(math.abs(luma - expected) < 0.02, s"seed=$seed frame $i")
      }
    }
  }

  test("dHash planted-twin bound and base separation hold over random seeds") {
    val rnd = new scala.util.Random(888L)
    def hashOf(seed: Long, p: Boolean): Long =
      graft.operators.Multimodal.dHash(
        graft.operators.Multimodal.decodeImage(
          graft.operators.Multimodal.synthPng(seed, p)).get)
    (1 to 20).foreach { _ =>
      val s1 = rnd.nextLong()
      val s2 = rnd.nextLong()
      val base = hashOf(s1, p = false)
      assert(java.lang.Long.bitCount(base ^ hashOf(s1, p = true)) <= 2, s"seed=$s1 twin")
      if (s1 != s2)
        assert(java.lang.Long.bitCount(base ^ hashOf(s2, p = false)) > 3,
          s"seeds=$s1/$s2 too close for the maxDist=3 verify")
    }
  }

  test("audio fingerprint planted-twin bound and base separation hold over random seeds") {
    val rnd = new scala.util.Random(999L)
    def hashOf(seed: Long, p: Boolean): Long = {
      val (samples, _) = graft.operators.Multimodal.decodeWav(
        graft.operators.Multimodal.synthWavPattern(seed, p)).get
      graft.operators.Multimodal.audioFingerprint(samples)
    }
    (1 to 12).foreach { _ =>
      val s1 = rnd.nextLong()
      val s2 = rnd.nextLong()
      val base = hashOf(s1, p = false)
      assert(java.lang.Long.bitCount(base ^ hashOf(s1, p = true)) <= 2, s"seed=$s1 twin")
      if (s1 != s2)
        assert(java.lang.Long.bitCount(base ^ hashOf(s2, p = false)) > 3,
          s"seeds=$s1/$s2 too close for the maxDist=3 verify")
    }
  }

  test("bloomPrefilterDupIds equals incrementalExactDupIds on random batches") {
    // 125 possible sentences → corpus covers most, so batches mix real
    // dups with fresh text; the bloom path must agree with the plain
    // anti-join truth exactly (false positives all die in the verify)
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
      def sentence() = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val corpus = Seq.tabulate(150)(i => (i.toLong, sentence()))
        .toDF("doc_id", "text")
      val batch = Seq.tabulate(60)(i => (1000L + i, sentence()))
        .toDF("doc_id", "text")
      val viaBloom = Dedup.bloomPrefilterDupIds(batch, corpus, "doc_id", "text",
        expectedItems = 500L, fpp = 0.05).as[Long].collect().toSet
      val plain = Dedup.incrementalExactDupIds(batch, corpus, "doc_id", "text")
        .as[Long].collect().toSet
      assert(viaBloom === plain, s"seed=$seed")
      assert(plain.nonEmpty, s"seed=$seed generated no dups — dead test")
    }
  }

  test("zValue equals a local bit-interleave reference on random coordinates") {
    val rnd = new scala.util.Random(77L)
    val pts = Seq.fill(300)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = df.select($"id", Catalog.zValue(Seq($"x", $"y"), 16).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def local(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> (15 - i)) & 1L) << (31 - 2 * i)
        z |= ((y >> (15 - i)) & 1L) << (31 - (2 * i + 1))
      }
      z
    }
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      assert(got(i.toLong) === local(x, y), s"($x,$y)")
    }
  }

  test("transpose then untranspose returns the original rows on random data") {
    val rnd = new scala.util.Random(7L)
    val classes = Seq("AAA", "BBB", "CCC", "DDD")
    // one value per (id, class) — pivot's first() is lossless exactly then
    val rows = (for { id <- 0L until 30L; c <- classes if rnd.nextBoolean() }
      yield (id, c, math.floor(rnd.nextDouble() * 1000) / 100)).toSeq
    val df = rows.toDF("ID", "CLASS", "SALES")
    val wide = Transpose(df, Seq("ID"), "CLASS", Seq("SALES"))
    val back = Transpose.untranspose(wide, Seq("ID"), "CLASS", Seq("SALES"))
      .as[(Long, String, Double)].collect().toSet
    assert(back === rows.toSet)
  }

  test("prefix-filtered joins equal brute force on random word-soup corpora") {
    // random docs over a tiny vocabulary maximize shared shingles and
    // boundary similarity values — the adversarial regime for a candidate
    // filter; both the symmetric and the directional join must reproduce
    // the brute-force pair sets exactly
    val rnd = new scala.util.Random(4242L)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val docs = Seq.tabulate(40) { i =>
      val n = 3 + rnd.nextInt(10)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs.select($"doc_id", Dedup.wordShingles($"text", 2).as("sh"))
    val a = sh.select($"doc_id".as("a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("b"), $"sh".as("sh_b"))
    for (tau <- Seq(0.3, 0.6)) {
      val bruteJ = a.crossJoin(b).where($"a" < $"b")
        .select($"a", $"b", Dedup.jaccard($"sh_a", $"sh_b").as("j"))
        .where($"j" >= tau).select($"a", $"b")
        .as[(Long, Long)].collect().toSet
      val gotJ = Dedup.prefixJaccardPairs(docs, "doc_id", "text", tau,
          shingleSize = 2)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(gotJ === bruteJ, s"jaccard tau=$tau")
      val bruteC = a.crossJoin(b).where($"a" =!= $"b")
        .select($"a", $"b",
          (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            size($"sh_a")).as("c"))
        .where($"c" >= tau).select($"a", $"b")
        .as[(Long, Long)].collect().toSet
      val gotC = Dedup.containmentPairs(docs, "doc_id", "text", tau,
          shingleSize = 2)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(gotC === bruteC, s"containment tau=$tau")
    }
  }

  test("merged partial stats equal built-in aggregates on random null-heavy data") {
    val rnd = new scala.util.Random(31337L)
    val rows = Seq.tabulate(300) { i =>
      val k = s"k${rnd.nextInt(7)}"
      // ~20% nulls, extreme magnitudes mixed with tiny values
      val v = if (rnd.nextInt(5) == 0) None
        else Some(rnd.nextDouble() * math.pow(10, rnd.nextInt(7) - 3))
      (i.toLong, k, v)
    }
    val df = rows.toDF("id", "k", "v")
    // split into 4 arbitrary parts; merged states must equal one pass
    val parts = (0 to 3).map(i => graft.operators.Stats.partialStats(
      df.where($"id" % 4 === i), Seq("k"), "v"))
    val merged = graft.operators.Stats.finalizeStats(
        graft.operators.Stats.mergeStats(Seq("k"), parts: _*), Seq("k"))
      .orderBy("k").collect()
    val direct = df.groupBy($"k").agg(
        count($"v").as("n"), sum($"v").as("sum"), avg($"v").as("mean"),
        stddev_samp($"v").as("sd"), min($"v").as("min"), max($"v").as("max"))
      .orderBy("k").collect()
    assert(merged.length === direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getString(0) === d.getString(0))
      assert(m.getLong(1) === d.getLong(1))
      for (i <- 2 to 6) {
        if (d.isNullAt(i)) assert(m.isNullAt(i), s"k=${m.getString(0)} col=$i")
        else {
          val rel = math.max(1.0, math.abs(d.getDouble(i)))
          assert(math.abs(m.getDouble(i) - d.getDouble(i)) / rel < 1e-9,
            s"k=${m.getString(0)} col=$i ${m.getDouble(i)} vs ${d.getDouble(i)}")
        }
      }
    }
  }

  test("tableFingerprint is invariant under random permutation and partitioning") {
    val rnd = new scala.util.Random(808L)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, s"v${rnd.nextInt(50)}", rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "s", "n")
    val cols = Seq("id", "s", "n")
    def fp(d: org.apache.spark.sql.DataFrame) = graft.operators.Checks
      .tableFingerprint(d, cols).as[(Long, Long)].collect().head
    val want = fp(df)
    for (trial <- 1 to 3) {
      val perm = rnd.shuffle(rows).toDF("id", "s", "n")
        .repartition(1 + rnd.nextInt(10))
      assert(fp(perm) === want, s"trial=$trial")
    }
    // and any single-row removal changes it
    val dropped = fp(df.where($"id" =!= 57L))
    assert(dropped._1 === want._1 - 1 && dropped._2 != want._2)
  }

  test("pageRank equals a local power iteration on random digraphs") {
    val rnd = new scala.util.Random(777L)
    for (trial <- 1 to 3) {
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(3 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (s, d) => s != d }.distinct
      for (redistribute <- Seq(false, true)) {
        val got = graft.operators.Graph
          .pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3,
            redistributeDangling = redistribute)
          .as[(Long, Double)].collect().toMap
        // local reference (same update rule)
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
        val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
        var r = nodes.map(_ -> 1.0 / nodes.size).toMap
        for (_ <- 1 to 3) {
          val dm = if (redistribute)
            nodes.filterNot(out.contains).map(r).sum else 0.0
          val in = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, _) => r(s) / out(s) }.sum).toMap
          r = nodes.map(v => v -> (0.15 / nodes.size +
            0.85 * (in.getOrElse(v, 0.0) + dm / nodes.size))).toMap
        }
        assert(got.keySet == r.keySet, s"trial=$trial")
        r.foreach { case (k, v) =>
          assert(math.abs(got(k) - v) < 1e-10,
            s"trial=$trial redistribute=$redistribute node=$k")
        }
      }
    }
  }

  test("stripCrossdocDuplicates equals a local keep-first reference on random corpora") {
    val n = 8
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      // small vocab + copied spans → cross-doc and within-doc repeats
      val spans = Seq.tabulate(4)(k =>
        Seq.fill(n + rnd.nextInt(4))(s"s${k}w${rnd.nextInt(3)}"))
      val docs = Seq.tabulate(12) { i =>
        val parts = Seq.fill(2 + rnd.nextInt(3))(
          if (rnd.nextBoolean()) spans(rnd.nextInt(spans.size))
          else Seq.fill(3 + rnd.nextInt(6))(s"u${i}x${rnd.nextInt(50)}"))
        (i.toLong, parts.flatten.mkString(" "))
      }
      val got = Dedup.stripCrossdocDuplicates(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = n)
        .select($"doc_id", $"text_clean").as[(Long, String)].collect().toMap

      // local reference: mark every non-first occurrence of a duplicated
      // n-gram, merge covered positions, rebuild
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val occ = scala.collection.mutable.Map.empty[Seq[String], List[(Long, Int)]]
      for ((id, ts) <- docs.map(d => d._1 -> toks(d._1)); p <- 0 to ts.length - n)
        occ(ts.slice(p, p + n)) = occ.getOrElse(ts.slice(p, p + n), Nil) :+ ((id, p))
      val marked = occ.values.filter(_.size >= 2)
        .flatMap(_.sortBy(identity).drop(1)).toSet
      val want = docs.map { case (id, _) =>
        val ts = toks(id)
        val covered = (for {
          p <- 0 to ts.length - n if marked((id, p)); i <- p until p + n
        } yield i).toSet
        id -> ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
          .mkString(" ")
      }.toMap
      assert(got === want, s"trial=$trial")
    }
  }

  test("cdcApply equals brute-force log replay on random changelogs") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      // ~30 keys, dense op streams with duplicate sequence values broken
      // by a unique change id, ~25% tombstones
      val log = Seq.tabulate(400) { i =>
        (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong, i.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000))
      }
      val df = log.toDF("k", "seq_ts", "cid", "op", "v")
      val got = RelOps.cdcApply(df, Seq("k"), Seq("seq_ts", "cid"), "op")
        .select($"k", $"v").as[(Long, Int)].collect().toMap
      val want = log.groupBy(_._1).flatMap { case (k, ops) =>
        val last = ops.maxBy(o => (o._2, o._3))
        if (last._4 == "D") None else Some(k -> last._5)
      }
      assert(got === want, s"trial=$trial")
    }
  }

  test("psiDrift equals a local PSI computation on random group histograms") {
    val rnd = new scala.util.Random(99L)
    val nBins = 8; val lo = 0.0; val hi = 80.0; val width = (hi - lo) / nBins
    val oldRows = Seq.tabulate(3000)(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(100) - 10)) // includes out-of-range
    val newRows = Seq.tabulate(3000)(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(120) - 20))
    val got = Checks.psiDrift(oldRows.toDF("g", "v"), newRows.toDF("g", "v"),
        Seq("g"), "v", lo, hi, nBins, psiRound = 9)
      .select($"g", $"psi").as[(String, Double)].collect().toMap
    def hist(rows: Seq[(String, Int)], g: String): Array[Long] = {
      val h = new Array[Long](nBins)
      rows.filter(_._1 == g).foreach { case (_, v) =>
        val b = math.min(math.max(math.floor((v - lo) / width), 0.0), nBins - 1.0).toInt
        h(b) += 1
      }
      h
    }
    for (g <- Seq("g0", "g1", "g2")) {
      val ho = hist(oldRows, g); val hn = hist(newRows, g)
      val no = ho.sum.toDouble + nBins / 2.0
      val nn = hn.sum.toDouble + nBins / 2.0
      val want = (0 until nBins).map { b =>
        val po = (ho(b) + 0.5) / no
        val pn = (hn(b) + 0.5) / nn
        (pn - po) * math.log(pn / po)
      }.sum
      assert(math.abs(got(g) - want) < 1e-8, s"$g: ${got(g)} vs $want")
    }
  }

  test("naiveBayesPredict agrees with a local NB on random corpora") {
    val rnd = new scala.util.Random(7L)
    val vocabByLab = Map(
      "a" -> Seq("ax", "ay", "az", "shared1", "shared2"),
      "b" -> Seq("bx", "by", "bz", "shared1", "shared2"),
      "c" -> Seq("cx", "cy", "shared1", "shared2", "shared3"))
    val labs = vocabByLab.keys.toSeq.sorted
    val docs = Seq.tabulate(120) { i =>
      val lab = labs(rnd.nextInt(labs.size))
      val words = Seq.fill(3 + rnd.nextInt(8))(
        vocabByLab(lab)(rnd.nextInt(vocabByLab(lab).size)))
      (i.toLong, words.mkString(" "), lab)
    }
    val got = graft.functions.TextStats
      .naiveBayesPredict(docs.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab")
      .select($"doc_id", $"predicted").as[(Long, String)].collect().toMap
    // local NB with identical smoothing + round-before-argmax
    val toks = docs.map { case (id, tx, lb) => (id, lb, tx.split("\\s+").toSeq) }
    val vocabN = toks.flatMap(_._3).distinct.size.toDouble
    val byLab = toks.groupBy(_._2).view.mapValues(_.flatMap(_._3)).toMap
    def score(ws: Seq[String], lb: String): BigDecimal = {
      val lt = byLab(lb); val t = lt.size.toDouble
      val prior = math.log(toks.count(_._2 == lb) / toks.size.toDouble)
      BigDecimal(prior + ws.map(w =>
          math.log((lt.count(_ == w) + 1) / (t + vocabN))).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    toks.foreach { case (id, _, ws) =>
      // engine tie rule: highest score, then label ASCENDING
      val want = labs.map(lb => (score(ws, lb), lb))
        .sortBy { case (s, l) => (-s, l) }.head._2
      assert(got(id) === want, s"doc $id")
    }
  }

  test("histQuantiles equals a local histogram interpolation on random keyed data") {
    val rnd = new scala.util.Random(20250814L)
    val (lo, hi, bins) = (0.0, 100.0, 16)
    val rows = Seq.tabulate(3000)(_ =>
      ("k" + rnd.nextInt(4), rnd.nextDouble() * 140 - 20)) // clamps both ends
    val state = operators.Stats.partialHist(rows.toDF("k", "v"), Seq("k"),
      "v", lo, hi, bins)
    val got = operators.Stats.histQuantiles(state, Seq("k"), lo, hi, bins,
        qs = Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val width = (hi - lo) / bins
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val counts = Array.fill(bins)(0L)
      vs.foreach { case (_, v) =>
        val b = math.min(bins - 1,
          math.max(0, math.floor((v - lo) / width).toInt))
        counts(b) += 1
      }
      val n = counts.sum
      def est(q: Double): Double = {
        val target = n * q
        val cum = counts.scanLeft(0L)(_ + _).tail
        val bin = cum.indexWhere(_ >= target) match {
          case -1 => bins - 1; case i => i }
        val before = if (bin == 0) 0L else cum(bin - 1)
        val cnt = counts(bin)
        lo + width * (bin +
          (if (cnt == 0) 0.0 else (target - before) / cnt))
      }
      val (gn, g50, g90) = got(k)
      assert(gn == n, s"key $k n")
      assert(math.abs(g50 - est(0.5)) < 1e-9, s"key $k p50")
      assert(math.abs(g90 - est(0.9)) < 1e-9, s"key $k p90")
    }
  }

  test("assignStableIds equals the local total-order numbering on random scrambled input") {
    val rnd = new scala.util.Random(777L)
    val rows = Seq.tabulate(2000)(i => (rnd.nextInt(50), i.toLong))
    val df = rows.toDF("g", "uid").repartition(17)
    val got = operators.RelOps
      .assignStableIds(df, Seq("g", "uid"), as = "rid")
      .select("rid", "g", "uid").as[(Long, Int, Long)].collect()
      .sortBy(_._1)
    val want = rows.sortBy(identity).zipWithIndex
      .map { case ((g, uid), i) => (i + 1L, g, uid) }
    assert(got.toSeq == want)
  }

  test("triangleStats equals a local brute-force census on random graphs") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = (for (a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.12) yield (a.toLong, b.toLong)).toSeq
      val got = operators.Graph.triangleStats(edges.toDF("src", "dst"))
        .collect().head
      val adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // yield the TRIANGLE, not a constant: a constant routed through the
      // Set inner generator collapses to Set(1) per edge and undercounts
      val localTri = (for ((a, b) <- edges; c <- adj(a) if c > b
        && adj(b).contains(c)) yield (a, b, c)).size
      val degs = adj.view.mapValues(_.size)
      val localWedges = degs.values.map(d => d.toLong * (d - 1) / 2).sum
      assert(got.getLong(0) == adj.size && got.getLong(1) == edges.size,
        s"seed $seed sizes")
      assert(got.getLong(2) == localTri, s"seed $seed triangles")
      assert(got.getLong(3) == localWedges, s"seed $seed wedges")
    }
  }

  test("kCore equals a local peel on random graphs") {
    val rnd = new scala.util.Random(7191L)
    val edges = Seq.fill(70)((rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
    for (k <- Seq(2, 3); rounds <- Seq(1, 10)) {
      val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // local mirror of the engine's contract: degrees over all nodes,
      // then peel (drop deg < k) with the same early-stop, `rounds` times
      val es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .filter(e => e._1 != e._2).distinct
      def degs(alive: Set[Long]): Map[Long, Long] =
        es.filter(e => alive(e._1) && alive(e._2))
          .flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, l) => (n, l.size.toLong) }
      var deg = degs(es.flatMap(e => Seq(e._1, e._2)).toSet)
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val alive = deg.filter(_._2 >= k).keySet
        if (alive.size == deg.size) done = true
        else { deg = degs(alive); r += 1 }
      }
      assert(got == deg, s"k=$k rounds=$rounds")
    }
  }

  test("Bpe.train equals a local reference on random corpora") {
    val rnd = new scala.util.Random(4242L)
    val alphabet = "abc"
    val vocab = Seq.fill(30)(
      Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(3))).mkString)
    val wordSeq = Seq.fill(200)(vocab(rnd.nextInt(vocab.size)))
    val docs = wordSeq.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val (merges, trained) = Bpe.train(Bpe.wordTable(docs, "text"), rounds = 6)
    val gotToks = Bpe.tokenCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // local mirror: same separator rendering, same weighted pair counts,
    // same (count desc, left, right) argmax, same single-pass replace
    val S = "\u001f"
    val freq = wordSeq.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    var sym: Map[String, String] =
      freq.map { case (w, _) => w -> (S + w.flatMap(c => s"$c$S")) }
    val localMerges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      freq.foreach { case (w, f) =>
        val parts = sym(w).split(S).filter(_.nonEmpty)
        parts.sliding(2).filter(_.length == 2)
          .foreach(p => counts((p(0), p(1))) += f)
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l0, r0), c0) => (-c0, l0, r0) }.head
        localMerges += ((l, r, c))
        sym = sym.map { case (w, s0) =>
          w -> s0.replace(S + l + S + r + S, S + l + r + S) }
      }
    }
    assert(merges.map(m => (m.left, m.right, m.pairCount)) == localMerges.toSeq)
    val localToks = sym.map { case (w, s0) =>
      w -> s0.split(S).count(_.nonEmpty).toLong }
    assert(gotToks == localToks)
  }

  test("skipgramCounts equals local window counting on random token docs") {
    val rnd = new scala.util.Random(515L)
    val toks = Seq("x", "y", "z", "w", "v")
    val docRows = Seq.tabulate(25)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(toks(rnd.nextInt(5))).mkString(" ")))
    val docs = docRows.toDF("doc_id", "text")
    val got = graft.functions.TextStats
      .skipgramCounts(docs, "text", window = 3, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val local = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    docRows.foreach { case (_, text) =>
      val ts = text.split("\\s+").filter(_.nonEmpty)
      for (i <- ts.indices; o <- 1 to 3 if i + o < ts.length)
        local((ts(i), ts(i + o))) += 1L
    }
    assert(got == local.toMap)
  }

  test("frequentTypePairs equals local basket counting on random events") {
    val rnd = new scala.util.Random(88L)
    val ev = Seq.fill(300)(
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(7)}"))
      .toDF("user_id", "event_type")
    val rows = ev.collect().map(r => (r.getLong(0), r.getString(1)))
    val baskets = rows.toSeq.distinct.groupBy(_._1).map { case (u, l) =>
      u -> l.map(_._2).toSet }
    val nUsers = baskets.size
    val local = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    baskets.values.foreach { b =>
      for (a <- b; c <- b if a < c) local((a, c)) += 1L
    }
    val expected = local.toMap.map { case (p, n) =>
      (p._1, p._2, n, BigDecimal(n.toDouble / nUsers)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._4 >= 0.1).toSet
    val got = Behavior.frequentTypePairs(ev, minSupport = 0.1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }
}
