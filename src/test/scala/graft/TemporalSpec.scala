package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward matches the most recent prior row per key, inclusive") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after u10's 09:00 purchase
      (2L, 10L, ts("2024-01-01 12:00:00")), // after u10's 11:00 purchase
      (3L, 10L, ts("2024-01-01 11:00:00")), // tie with the 11:00 purchase → inclusive
      (4L, 20L, ts("2024-01-01 08:00:00")), // u20 has no prior purchase → null
      (5L, 30L, ts("2024-01-01 09:00:00"))  // u30 never purchases → null
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:00:00"), 5.0),
      (10L, ts("2024-01-01 11:00:00"), 7.0),
      (20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("user_id", "pts", "value")

    val out = Temporal.asofJoinBackward(clicks, purchases, Seq("user_id"),
        "ts", "pts", Seq("value"))
      .select("event_id", "asof_pts", "asof_value")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2))))
      .toSeq.sortBy(_._1)

    assert(out === Seq(
      (1L, Some(ts("2024-01-01 09:00:00")), Some(5.0)),
      (2L, Some(ts("2024-01-01 11:00:00")), Some(7.0)),
      (3L, Some(ts("2024-01-01 11:00:00")), Some(7.0)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("asofJoinBackward keeps genuinely-null payload values (struct transport)") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(3.0)),
      (1L, ts("2024-01-01 09:00:00"), None: Option[Double]) // latest row, null value
    ).toDF("k", "pts", "value")
    val r = Temporal.asofJoinBackward(left, right, Seq("k"), "ts", "pts", Seq("value"))
      .select("asof_pts", "asof_value").collect().head
    // must match the 09:00 row (null value), NOT fall back to 08:00's 3.0
    assert(r.getTimestamp(0) === ts("2024-01-01 09:00:00") && r.isNullAt(1))
  }

  private val bands = Seq(
    ("low", 0.0, 100.0),
    ("mid", 100.0, 250.0),
    ("high", 250.0, 1000.0)
  ).toDF("band", "lo", "hi")
  private val points = Seq(
    (1L, 0.0), (2L, 99.999), (3L, 100.0), (4L, 249.0), (5L, 250.0),
    (6L, 999.0), (7L, 1000.0), (8L, -5.0)
  ).toDF("id", "v")

  test("broadcastRangeJoin is half-open [lo, hi) and drops out-of-band rows") {
    val got = Temporal.broadcastRangeJoin(points, bands, "v", "lo", "hi")
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "low"), (2L, "low"), (3L, "mid"), (4L, "mid"),
      (5L, "high"), (6L, "high")))
  }

  test("bucketedRangeJoin matches broadcastRangeJoin for any bucket width") {
    val expect = Temporal.broadcastRangeJoin(points, bands, "v", "lo", "hi")
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (w <- Seq(10.0, 100.0, 333.0)) {
      val got = Temporal.bucketedRangeJoin(points, bands, "v", "lo", "hi", w)
        .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === expect, s"width $w")
    }
  }

  test("scd2 collapses unchanged runs into validity intervals") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val log = Seq(
      (7L, ts(0), 1L, "bronze"),
      (7L, ts(10), 2L, "bronze"), // unchanged → collapses into the first
      (7L, ts(20), 3L, "gold"),   // change
      (7L, ts(30), 4L, "gold"),   // unchanged
      (7L, ts(40), 5L, "bronze"), // back to an EARLIER value — a new version
      (8L, ts(5), 6L, "silver"))  // other key, single current version
      .toDF("user_id", "ts", "event_id", "tier")
    val out = Temporal.scd2(log, Seq("user_id"), "ts", Seq("tier"),
        tieBreak = Seq("event_id"))
      .select($"user_id", $"tier", $"eff_from", $"eff_to", $"is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(out === Seq(
      (7L, "bronze", ts(0), Some(ts(20)), false),
      (7L, "gold", ts(20), Some(ts(40)), false),
      (7L, "bronze", ts(40), None, true),
      (8L, "silver", ts(5), None, true)))
    // null-safe change detection: value transitioning to NULL is a change
    val withNull = Seq(
      (9L, ts(0), 1L, "a"), (9L, ts(10), 2L, null), (9L, ts(20), 3L, null))
      .toDF("user_id", "ts", "event_id", "tier")
    val v = Temporal.scd2(withNull, Seq("user_id"), "ts", Seq("tier"),
        tieBreak = Seq("event_id"))
    assert(v.count() === 2) // "a" and the null run — not three, not one
  }

  test("scd2 keeps a key whose FIRST tracked value is null") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    // null <=> lag(=null) is TRUE on the first row — without the explicit
    // first-row keep, this entity's opening interval silently vanished
    val log = Seq(
      (1L, ts(0), 1L, null), (1L, ts(10), 2L, "a"),
      (2L, ts(0), 3L, null)) // a key whose ONLY value is null
      .toDF("user_id", "ts", "event_id", "tier")
    val out = Temporal.scd2(log, Seq("user_id"), "ts", Seq("tier"),
        tieBreak = Seq("event_id"))
      .select($"user_id", $"tier", $"eff_from", $"eff_to")
      .as[(Long, Option[String], Timestamp, Option[Timestamp])]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(out === Seq(
      (1L, None, ts(0), Some(ts(10))),
      (1L, Some("a"), ts(10), None),
      (2L, None, ts(0), None)))
  }

  test("scd2Merge equals the full rebuild; untouched keys pass through") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val early = Seq(
      (7L, ts(0), 1L, "bronze"), (7L, ts(10), 2L, "bronze"),
      (7L, ts(20), 3L, "gold"),
      (8L, ts(5), 4L, "silver"),   // untouched by the batch
      (9L, ts(0), 5L, "a"))
      .toDF("user_id", "ts", "event_id", "tier")
    val late = Seq(
      (7L, ts(40), 6L, "bronze"),  // new version for an existing key
      (9L, ts(30), 7L, "a"),       // no-op change → must collapse
      (5L, ts(50), 8L, "fresh"))   // brand-new key
      .toDF("user_id", "ts", "event_id", "tier")
    val existing = Temporal.scd2(early, Seq("user_id"), "ts", Seq("tier"),
      tieBreak = Seq("event_id"))
    val merged = Temporal.scd2Merge(existing, late, Seq("user_id"), "ts",
        Seq("tier"), tieBreak = Seq("event_id"))
      .select($"user_id", $"tier", $"eff_from", $"eff_to", $"is_current")
    val full = Temporal.scd2(early.unionByName(late), Seq("user_id"), "ts",
        Seq("tier"), tieBreak = Seq("event_id"))
      .select($"user_id", $"tier", $"eff_from", $"eff_to", $"is_current")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "incremental merge diverged from the full rebuild")
  }

  test("scd2Merge rejects out-of-order batches loudly") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val early = Seq((7L, ts(0), 1L, "bronze"), (7L, ts(20), 2L, "gold"))
      .toDF("user_id", "ts", "event_id", "tier")
    val existing = Temporal.scd2(early, Seq("user_id"), "ts", Seq("tier"),
      tieBreak = Seq("event_id"))
    // a change BETWEEN existing versions can't be replayed incrementally
    val stale = Seq((7L, ts(10), 3L, "silver"))
      .toDF("user_id", "ts", "event_id", "tier")
    val ex = intercept[Throwable] {
      Temporal.scd2Merge(existing, stale, Seq("user_id"), "ts", Seq("tier"),
        tieBreak = Seq("event_id")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(ex).contains("scd2Merge"), s"expected loud guard, got ${msgs(ex)}")
  }

  test("temporalSplit: cutoff inclusive for train, no-leak invariant holds") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-25 00:00:00")), // exactly the cutoff → train
      (3L, ts("2024-01-25 00:00:01")),
      (4L, ts("2024-01-29 12:00:00"))).toDF("id", "t")
    val got = Temporal.temporalSplit(df, "t",
        to_timestamp(lit("2024-01-25 00:00:00")))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "train", 2L -> "train", 3L -> "test", 4L -> "test"))
    val leak = Temporal.temporalSplit(df, "t",
        to_timestamp(lit("2024-01-25 00:00:00")))
      .agg((max(when($"split" === "train", $"t")) <
        min(when($"split" === "test", $"t"))).as("ok"))
      .as[Boolean].collect()(0)
    assert(leak)
  }

  test("temporalSplitAtFraction puts ~the right mass on the train side") {
    def ts2(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val df = (1L to 1000L).map(i => (i, ts2(i))).toDF("id", "t")
    val sides = Temporal.temporalSplitAtFraction(df, "t", 0.8)
      .groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(sides("train") - 800L) <= 1, sides.toString)
    assert(sides("train") + sides("test") === 1000L)
  }

  test("validityIntervals: half-open windows chain version boundaries; horizon closes the newest") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val bounds = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-11 00:00:00"),
        (3L, "2024-01-21 00:00:00")).toDF("version", "vfs")
      .withColumn("valid_from", to_timestamp(col("vfs"))).drop("vfs")
    val horizon = to_timestamp(lit("2100-01-01 00:00:00"))
    val iv = Temporal.validityIntervals(bounds, "valid_from", horizon)
      .orderBy(col("version"))
      .select(col("version"), col("valid_from").cast("string"),
        col("__valid_to").cast("string"))
      .as[(Long, String, String)].collect().toSeq
    assert(iv == Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-11 00:00:00"),
      (2L, "2024-01-11 00:00:00", "2024-01-21 00:00:00"),
      (3L, "2024-01-21 00:00:00", "2100-01-01 00:00:00")))
    // composed with the broadcast range join: a fact AT a boundary
    // belongs to the NEWER version (half-open), one interval per fact
    val facts = Seq((10L, "2024-01-10 23:59:59"), (11L, "2024-01-11 00:00:00"),
        (12L, "2024-01-21 00:00:00"))
      .toDF("fid", "tss").withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val picked = Temporal.broadcastRangeJoin(facts,
        Temporal.validityIntervals(bounds, "valid_from", horizon),
        "ts", "valid_from", "__valid_to")
      .select(col("fid"), col("version"))
      .as[(Long, Long)].collect().toMap
    assert(picked == Map(10L -> 1L, 11L -> 2L, 12L -> 3L))
  }

  test("scd2 tombstones: a delete closes the interval, a re-insert reopens even with identical values") {
    import org.apache.spark.sql.functions.col
    val log = Seq(
      ("A", 1L, Option(10L), false),
      ("A", 3L, Option.empty[Long], true), // delete at version 3
      ("A", 5L, Option(10L), false),       // re-insert with the SAME value
      ("B", 1L, Option(7L), false),
      ("B", 4L, Option(8L), false),
      ("B", 6L, Option(8L), false))        // genuine no-op: still collapses
      .toDF("k", "version", "bal", "del")
    val iv = Temporal.scd2(log, Seq("k"), "version", Seq("bal"),
      deleteCol = Some("del"))
    assert(!iv.columns.contains("del") && !iv.columns.contains("__del"))
    val rows = iv.select(col("k"), col("bal"), col("eff_from"),
        col("eff_to"), col("is_current"))
      .as[(String, Option[Long], Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows === Seq(
      // A: [1,3) closed BY the delete, absent [3,5), reopened at 5 —
      // the identical value must not collapse across the gap
      ("A", Some(10L), 1L, Some(3L), false),
      ("A", Some(10L), 5L, None, true),
      ("B", Some(7L), 1L, Some(4L), false),
      ("B", Some(8L), 4L, None, true)))
    // without deleteCol the same log treats the tombstone as a value row
    // (legacy behavior preserved)
    val legacy = Temporal.scd2(log, Seq("k"), "version", Seq("bal"))
    assert(legacy.where(col("k") === "A").count() === 3)
  }

  test("scd2Merge with deleteCol: replay reconstructs tombstones; merge equals the full rebuild across a deletion gap") {
    import org.apache.spark.sql.functions.col
    val early = Seq(
      ("A", 1L, Option(10L), false),
      ("A", 3L, Option.empty[Long], true), // delete at 3
      ("B", 1L, Option(7L), false),        // untouched by the batch
      ("C", 2L, Option(5L), false),
      ("C", 4L, Option.empty[Long], true), // delete at 4 ...
      ("C", 6L, Option(5L), false))        // ... re-insert, same value
      .toDF("k", "version", "bal", "del")
    val late = Seq(
      // the EXACT resurrection trap: a value-equal re-insert after a
      // deletion gap — a delete-unaware replay would collapse A back
      // into one interval, silently erasing the [3,8) absence
      ("A", 8L, Option(10L), false),
      ("C", 9L, Option.empty[Long], true)) // a delete arriving in the batch
      .toDF("k", "version", "bal", "del")
    val existing = Temporal.scd2(early, Seq("k"), "version", Seq("bal"),
      deleteCol = Some("del"))
    val merged = Temporal.scd2Merge(existing, late, Seq("k"), "version",
        Seq("bal"), deleteCol = Some("del"))
      .select(col("k"), col("bal"), col("eff_from"), col("eff_to"),
        col("is_current"))
    val full = Temporal.scd2(early.unionByName(late), Seq("k"), "version",
        Seq("bal"), deleteCol = Some("del"))
      .select(col("k"), col("bal"), col("eff_from"), col("eff_to"),
        col("is_current"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "tombstone-aware merge diverged from the full rebuild")
    // sanity on the trap itself: A stays two intervals with the gap
    val a = merged.where(col("k") === "A")
      .as[(String, Option[Long], Long, Option[Long], Boolean)]
      .collect().sortBy(_._3).toSeq
    assert(a === Seq(("A", Some(10L), 1L, Some(3L), false),
      ("A", Some(10L), 8L, None, true)),
      s"deletion gap resurrected: $a")
  }

  test("scd2Merge without deleteCol REFUSES a tombstoned interval table instead of resurrecting deletions") {
    import org.apache.spark.sql.functions.col
    val early = Seq(
      ("A", 1L, Option(10L), false),
      ("A", 3L, Option.empty[Long], true))
      .toDF("k", "version", "bal", "del")
    val existing = Temporal.scd2(early, Seq("k"), "version", Seq("bal"),
      deleteCol = Some("del"))
    val late = Seq(("A", 8L, Option(10L), false))
      .toDF("k", "version", "bal", "del").drop("del")
    val ex = intercept[Throwable] {
      Temporal.scd2Merge(existing, late, Seq("k"), "version", Seq("bal"))
        .collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(ex).contains("deletion gaps"),
      s"expected loud tombstone guard, got ${msgs(ex)}")
  }
}
