package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelOps

class RelOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed fact table") {
    // 10k facts all hitting ONE key — the pathological hot-key shape
    val facts = ((1 to 10000).map(i => (i.toLong, 1)) ++ Seq((0L, 2), (-1L, 3)))
      .toDF("row_id", "k")
    val dim = Seq((1, "hot"), (2, "cold"), (3, "mild"), (4, "unused")).toDF("k", "label")
    val plain = facts.join(dim, Seq("k")).select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = RelOps.saltedJoin(facts, dim, Seq("k"), buckets = 8)
      .select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain && plain.size === 10002)
  }

  test("saltedJoin left join preserves unmatched facts exactly once") {
    val facts = Seq((1L, 1), (2L, 99)).toDF("row_id", "k")
    val dim = Seq((1, "hot")).toDF("k", "label")
    val out = RelOps.saltedJoin(facts, dim, Seq("k"), buckets = 4, joinType = "left")
      .select("row_id", "label")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq.sortBy(_._1)
    assert(out === Seq((1L, Some("hot")), (2L, None)))
  }

  test("saltedJoin actually spreads a hot key over several salt buckets") {
    val facts = (1 to 1000).map(i => (i.toLong, 1)).toDF("row_id", "k")
    val salts = facts.withColumn("__salt",
      pmod(xxhash64(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key spread over most of 8 buckets, got $salts")
  }

  test("hashSample is deterministic, near-rate, and partition-independent") {
    val df = (1L to 10000L).toDF("id")
    val a = RelOps.hashSample(df, "id", 0.1).select("id").collect().map(_.getLong(0)).toSet
    val b = RelOps.hashSample(df.repartition(7), "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b) // same rows regardless of partitioning
    assert(math.abs(a.size - 1000) < 150, s"sampled ${a.size} of 10000 at rate 0.1")
    // monotone: a smaller rate selects a subset of a larger rate
    val small = RelOps.hashSample(df, "id", 0.02)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("stratifiedHashSample applies per-stratum rates; absent strata drop") {
    val df = (1L to 6000L).map(i => (i, Seq("en", "de", "fr")((i % 3).toInt)))
      .toDF("id", "lang")
    val out = RelOps.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.05)).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("fr"))
    assert(math.abs(out("en") - 1000) < 150, s"en kept ${out.get("en")} of 2000 at 0.5")
    assert(math.abs(out("de") - 100) < 60, s"de kept ${out.get("de")} of 2000 at 0.05")
  }

  test("snapshotDiff classifies every key, null-safe") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, Option.empty[String].orNull), (5L, "e")).toDF("id", "v")
    val v2 = Seq((1L, "a"),            // unchanged
      (2L, "B"),                       // changed
      (4L, "now-set"),                 // NULL → value = changed
      (5L, Option.empty[String].orNull), // value → NULL = changed
      (6L, "f"))                       // added; 3 removed
      .toDF("id", "v")
    val got = RelOps.snapshotDiff(v1, v2, Seq("id"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"))
  }

  test("evolvedSnapshotDiff compares shared columns only; schemaDelta reports the change") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // v2 adds `extra` and drops nothing; row 2's shared column changed,
    // row 1's did not — the added column must NOT flip row 1 to changed
    val v2 = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "z"))
      .toDF("id", "v", "extra")
    val got = RelOps.evolvedSnapshotDiff(v1, v2, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    assert(RelOps.schemaDelta(v1, v2) === Seq("extra" -> "added"))
    assert(RelOps.schemaDelta(v2, v1) === Seq("extra" -> "removed"))
    // no shared non-key columns → refuse loudly, never an empty hash
    intercept[IllegalArgumentException] {
      RelOps.evolvedSnapshotDiff(
        Seq((1L, "a")).toDF("id", "only_old"),
        Seq((1L, "b")).toDF("id", "only_new"), Seq("id"))
    }
  }

  test("cdcApply keeps the latest op per key and drops tombstoned keys") {
    val log = Seq(
      // key 1: upsert then later upsert — latest value wins
      (1L, 10L, 100L, "U", "a"),
      (1L, 20L, 101L, "U", "b"),
      // key 2: upsert then delete — key vanishes
      (2L, 10L, 102L, "U", "x"),
      (2L, 30L, 103L, "D", "x"),
      // key 3: delete then RE-INSERT — key comes back
      (3L, 10L, 104L, "D", "old"),
      (3L, 40L, 105L, "U", "new"),
      // key 4: same ts, change id breaks the tie (106 < 107 → 107 wins)
      (4L, 50L, 106L, "U", "first"),
      (4L, 50L, 107L, "U", "second"))
      .toDF("k", "seq_ts", "change_id", "op", "v")
    val got = RelOps.cdcApply(log, Seq("k"), Seq("seq_ts", "change_id"), "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "b", 3L -> "new", 4L -> "second"))
  }

  test("cdcApply of a log prefix reproduces that moment's snapshot") {
    val log = Seq((1L, 1L, "U", 10), (1L, 2L, "D", 0), (1L, 3L, "U", 30))
      .toDF("k", "seq", "op", "v")
    def snap(upTo: Long) =
      RelOps.cdcApply(log.where($"seq" <= upTo), Seq("k"), Seq("seq"), "op")
        .select("k", "v").as[(Long, Int)].collect().toMap
    assert(snap(1L) === Map(1L -> 10))
    assert(snap(2L) === Map.empty[Long, Int])
    assert(snap(3L) === Map(1L -> 30))
  }

  test("joinSizeEstimate: exact product-sum equals the real join; empty join yields null top") {
    val left = Seq(1L, 1L, 2L, 3L).toDF("lk")   // counts: 1→2, 2→1, 3→1
    val right = Seq(1L, 2L, 2L, 2L, 9L).toDF("rk") // counts: 1→1, 2→3, 9→1
    val r = RelOps.joinSizeEstimate(left, "lk", right, "rk").collect().head
    // keys joined: 1 (2*1=2), 2 (1*3=3) → n_join 5 = real join size
    val real = left.join(right, $"lk" === $"rk").count()
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L && r.getLong(2) == 2L)
    assert(r.getLong(3) == real && real == 5L)
    assert(r.getDouble(4) == 1.25)
    assert(r.getString(5) == "2" && r.getLong(6) == 3L) // heaviest key
    // disjoint keys: zero estimate, null top (no fabricated row)
    val e = RelOps.joinSizeEstimate(
      Seq(1L).toDF("lk"), "lk", Seq(2L).toDF("rk"), "rk").collect().head
    assert(e.getLong(3) == 0L && e.isNullAt(5) && e.isNullAt(6))
  }

  test("assignStableIds: contiguous 1..n in sort order across many partitions") {
    // enough rows that range partitioning actually spreads them
    val rows = (0 until 5000).map(i => ((i * 7919) % 5000, s"v$i"))
    val df = rows.toDF("k", "v").repartition(13) // scrambled input layout
    val got = RelOps.assignStableIds(df, Seq("k"), as = "rid")
      .select("rid", "k").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 5000L).toSeq, "ids not contiguous")
    assert(got.map(_._2).toSeq == rows.map(_._1).sorted, "ids not in k order")
    // startAt shifts the whole range
    val shifted = RelOps.assignStableIds(df, Seq("k"), as = "rid",
        startAt = 100L)
      .agg(min($"rid"), max($"rid")).as[(Long, Long)].head()
    assert(shifted == ((100L, 5099L)))
    // empty input yields an empty frame, not a failure
    assert(RelOps.assignStableIds(df.where($"k" < 0), Seq("k")).count() == 0L)
  }
}
