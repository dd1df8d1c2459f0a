package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel enforces strict stage ordering with first-touch semantics") {
    val events = Seq(
      // u1 completes view -> click -> buy in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "buy"),
      // u2 clicks BEFORE viewing: click doesn't count until after the view,
      // and no later click exists -> stops at stage 0
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // u3 views and clicks, buys before the click -> stops at stage 1
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:10:00"), "buy"),
      (3L, ts("2024-01-01 08:20:00"), "click"),
      // u4 never enters the funnel
      (4L, ts("2024-01-01 07:00:00"), "buy"))
      .toDF("user_id", "ts", "event_type")

    val out = Behavior.funnel(events, Seq("view", "click", "buy"))
      .orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((0, "view", 3L), (1, "click", 2L), (2, "buy", 1L)))
  }

  test("funnel fails loudly when a user's history exceeds maxEventsPerUser") {
    val events = (1 to 6).map(i =>
      (1L, ts(f"2024-01-01 10:0$i:00"), "view")).toDF("user_id", "ts", "event_type")
    val ex = intercept[Throwable] {
      Behavior.funnel(events, Seq("view"), maxEventsPerUser = 3).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(ex).contains("maxEventsPerUser"),
      s"expected the actionable raise_error message, got: ${msgs(ex)}")
    // at the default cap the same history is fine
    assert(Behavior.funnel(events, Seq("view")).count() === 1)
  }

  test("funnel first-touch uses the earliest qualifying event per stage") {
    // Two views: the funnel chains from the FIRST view, so the click
    // between them still qualifies (it is after view #1).
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(events, Seq("view", "click"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((0, "view", 1L), (1, "click", 1L)))
  }

  test("weeklyRetention cohorts by first week and counts distinct users") {
    val events = Seq(
      // u1 first seen week of Jan 1 (Mon), active again weeks +1 and +3
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-10 10:00:00"), "view"),
      (1L, ts("2024-01-22 10:00:00"), "view"),
      // u2 same cohort, only week 0 (two events collapse to one cell)
      (2L, ts("2024-01-03 10:00:00"), "view"),
      (2L, ts("2024-01-04 10:00:00"), "view"),
      // u3 cohort of Jan 8, active week +1
      (3L, ts("2024-01-08 10:00:00"), "view"),
      (3L, ts("2024-01-17 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")

    val out = Behavior.weeklyRetention(events)
      .orderBy("cohort_week", "week_offset")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("w"),
        col("week_offset"), col("users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 3, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("valueAnomalies flags bucket outliers, null z-score for degenerate buckets") {
    val base = (0 until 20).map(i =>
      (i.toLong, ts("2024-01-01 10:15:00"), 1L, "m", 0.0))
    val events = (base ++ Seq(
      (100L, ts("2024-01-01 10:30:00"), 1L, "m", 100.0), // clear outlier
      (101L, ts("2024-01-01 11:00:00"), 1L, "m", 5.0),   // lone row in its bucket
      (102L, ts("2024-01-01 12:00:00"), 1L, "c", 7.0),   // constant bucket
      (103L, ts("2024-01-01 12:30:00"), 1L, "c", 7.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Behavior.valueAnomalies(events, z = 3.0)
      .select("event_id", "zscore", "is_anomaly").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val (zOut, flagOut) = out(100L)
    assert(zOut.exists(_.asInstanceOf[Double] > 3.0))
    assert(flagOut.contains(true))
    assert(out(0L)._2.contains(false))     // inlier in a live bucket
    assert(out(101L)._1.isEmpty)           // single-row bucket: stddev null
    assert(out(102L)._1.isEmpty)           // constant bucket: stddev 0
  }

  test("scoreAgainstBaseline keeps events whose bucket the baseline never saw") {
    val history = Seq((1L, ts("2024-01-01 10:00:00"), "known", 1.0),
      (2L, ts("2024-01-01 10:01:00"), "known", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val live = Seq(
      (10L, ts("2024-01-02 10:00:00"), "known", 1.5),
      (11L, ts("2024-01-02 10:00:00"), "brand_new_type", 9.9), // unseen bucket
      (12L, ts("2024-01-02 23:00:00"), "known", 1.5))          // unseen hour
      .toDF("event_id", "ts", "event_type", "value")
    val out = Behavior.scoreAgainstBaseline(live,
        Behavior.baselineStats(history))
      .select("event_id", "zscore").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out.keySet === Set(10L, 11L, 12L)) // nothing silently dropped
    assert(out(10L).isDefined)
    assert(out(11L).isEmpty && out(12L).isEmpty) // unseen → null, not gone
  }

  test("topEventPaths counts consecutive windows per user, ts-then-id order") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "b"), // u1: a>b>c, b>c>b
      (5L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (6L, ts("2024-01-01 09:01:00"), 2L, "b"),
      (7L, ts("2024-01-01 09:02:00"), 2L, "c"), // u2: a>b>c
      (8L, ts("2024-01-01 08:00:00"), 3L, "a")) // too short: no path
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.topEventPaths(events, n = 3, topK = 5)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a > b > c", 2L), ("b > c > b", 1L)))
  }

  test("rollingStickiness: exact trailing 7-day distinct users") {
    val events = Seq(
      // u1 active day 1 and day 5; u2 active day 1 only
      (1L, ts("2024-01-01 10:00:00"), 1L, "e"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "e"),
      (3L, ts("2024-01-05 10:00:00"), 1L, "e"),
      // day 9: u1's day-5 activity still in the window, day-1 is not
      (4L, ts("2024-01-09 10:00:00"), 2L, "e"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.rollingStickiness(events)
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("dau"), col("wau"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 2L, 2L),
      ("2024-01-05", 1L, 2L),   // window [day-6, day] covers day 1: u1+u2
      ("2024-01-09", 1L, 2L)))  // u2 today + u1 from day 5; day 1 aged out
  }

  test("funnel plans exactly one exchange (the user_id aggregation)") {
    val events = Seq((1L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val plan = Behavior.funnel(events, Seq("view", "click"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges:\n${plan.take(3000)}")
  }

  test("debounce keeps the first event of a burst and events past the gap") {
    def ts2(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = Seq(
      // user 1, type a: burst at 0/5/8 (lag gaps 5 and 3 suppress), then
      // 700 — measured from the previous RAW event (8): 692 > 600 → kept
      (1L, "a", ts2(0), 1L), (1L, "a", ts2(5), 2L), (1L, "a", ts2(8), 3L),
      (1L, "a", ts2(700), 4L),
      // user 1, type b is an independent key
      (1L, "b", ts2(2), 5L),
      // user 2: equal timestamps, tie broken by event_id — second drops
      (2L, "a", ts2(0), 6L), (2L, "a", ts2(0), 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val kept = Behavior.debounce(events,
        Seq("user_id", "event_type"), "ts", gapSec = 600L,
        tieBreak = Seq("event_id"))
      .select($"event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L))
  }

  test("debounce boundary: a gap of exactly gapSec is suppressed (strict >)") {
    def ts2(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = Seq((1L, ts2(0), 1L), (1L, ts2(600), 2L), (1L, ts2(1201), 3L))
      .toDF("user_id", "ts", "event_id")
    val kept = Behavior.debounce(events,
        Seq("user_id"), "ts", gapSec = 600L, tieBreak = Seq("event_id"))
      .select($"event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("funnelLatency differences the same first-touch chain funnel counts") {
    def ts2(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = Seq(
      // user 1 converts fully: a@0 -> b@10 -> c@40 (lat 10s, 30s)
      (1L, "a", ts2(0)), (1L, "b", ts2(10)), (1L, "c", ts2(40)),
      // user 2: b BEFORE its a never counts; chain a@5 -> b@25 (lat 20s)
      (2L, "b", ts2(1)), (2L, "a", ts2(5)), (2L, "b", ts2(25)),
      // user 3: a only — converts nothing
      (3L, "a", ts2(0)),
      // user 4: b at the SAME ts as a — strict 'after' excludes it
      (4L, "a", ts2(0)), (4L, "b", ts2(0)))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.funnelLatency(events, Seq("a", "b", "c"))
      .orderBy($"stage_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // a->b: users 1 (10s) and 2 (20s): p50 = 15s, p90 = 19s (interpolated)
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", "b", 2L), ("b", "c", 1L)))
    assert(got(0)._4 == 15000000.0 && got(0)._5 == 19000000.0)
    assert(got(1)._4 == 30000000.0 && got(1)._5 == 30000000.0)
    // and the counts agree with funnel's reach numbers
    val reach = Behavior.funnel(events, Seq("a", "b", "c"))
      .orderBy($"stage_idx").select("users").as[Long].collect().toSeq
    assert(reach == Seq(4L, 2L, 1L))
  }

  test("rateAnomalies flags a planted burst hour; degenerate types score null") {
    def at(h: Int, i: Int) =
      new java.sql.Timestamp(1700000000000L + h * 3600000L + i * 1000L)
    val events = (
      // type "a": 9 calm hours of 2 events + one 12-event burst hour
      // (the burst inflates its own baseline sd: counts [2×9, 12] give
      // mean 3, sd √10 → burst z ≈ 2.85, calm z ≈ −0.32)
      (for (h <- 0 until 9; i <- 0 until 2) yield ("a", at(h, i))) ++
      (for (i <- 0 until 12) yield ("a", at(9, i))) ++
      // type "b": single hour → no distribution → null z
      Seq(("b", at(0, 0)), ("b", at(0, 1))) ++
      // type "c": two hours with IDENTICAL counts → zero variance → null
      Seq(("c", at(0, 0)), ("c", at(1, 0)))
    ).toDF("event_type", "ts")
    val got = Behavior.rateAnomalies(events, zThresh = 2.0)
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime), r)).toMap
    val burst = got(("a", 1700000000000L / 3600000L * 3600000L + 9 * 3600000L))
    assert(burst.getLong(2) == 12L && burst.getBoolean(4),
      s"burst hour must flag: $burst")
    // the calm hours of "a" are below threshold
    (0 until 9).foreach { h =>
      val r = got(("a", 1700000000000L / 3600000L * 3600000L + h * 3600000L))
      assert(!r.getBoolean(4), s"calm hour $h flagged: $r")
    }
    assert(got.keys.count(_._1 == "b") == 1 &&
      got.collect { case ((t, _), r) if t == "b" => r.isNullAt(3) && r.isNullAt(4) }.forall(identity))
    assert(got.collect { case ((t, _), r) if t == "c" => r.isNullAt(3) }.forall(identity))
  }

  test("frequentTypePairs: support over distinct baskets, maxBasket guard, rounded threshold") {
    // users: 1 {a,b,c}, 2 {a,b}, 3 {a,c}, 4 {a} → n=4 users
    // pairs: (a,b)=2 (.5), (a,c)=2 (.5), (b,c)=1 (.25)
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"), // duplicate (1,a) collapses
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a"))
      .toDF("user_id", "event_type")
    val got = Behavior.frequentTypePairs(ev, minSupport = 0.3)
      .orderBy(col("type_a"), col("type_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "b", 2L, 0.5), ("a", "c", 2L, 0.5)))
    // a bot basket above maxBasket drops out of pairs AND the denominator
    val bot = (1 to 5).map(i => (9L, s"t$i")).toDF("user_id", "event_type")
    val guarded = Behavior.frequentTypePairs(ev.unionByName(bot),
        minSupport = 0.3, maxBasket = 4)
      .orderBy(col("type_a"), col("type_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(guarded.toSeq == Seq(("a", "b", 2L, 0.5), ("a", "c", 2L, 0.5)))
  }

  test("associationRules: confidence and lift from exact basket counts") {
    // baskets: 1 {a,b}, 2 {a,b}, 3 {a}, 4 {b,c} → N=4
    // a→b: n=2, conf 2/3, lift (2*4)/(3*3); b→a mirrors with conf 2/3;
    // b→c: n=1, conf 1/3, lift (1*4)/(3*1)
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (4L, "b"), (4L, "c")).toDF("user_id", "event_type")
    val got = Behavior.associationRules(ev, minSupport = 0.25)
      .orderBy(col("type_a"), col("type_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("a", "b", 2L, 0.5, 0.666667, 0.888889),
      ("b", "a", 2L, 0.5, 0.666667, 0.888889),
      ("b", "c", 1L, 0.25, 0.333333, 1.333333),
      ("c", "b", 1L, 0.25, 1.0, 1.333333)))
  }

  test("scoreRates surfaces a type absent from the baseline (null z, never dropped)") {
    // the streaming monitor's strongest volume anomaly is a brand-new
    // event type — an inner join would silently erase it
    val counts = Seq(
      ("seen", ts("2024-01-01 10:00:00"), 3L),
      ("brand_new", ts("2024-01-01 10:00:00"), 50L)).toDF("event_type", "hour", "n")
    val baseline = Behavior.rateBaseline(
      Seq(("seen", ts("2024-01-01 08:00:00"), 2L),
        ("seen", ts("2024-01-01 09:00:00"), 4L)).toDF("event_type", "hour", "n"))
    val got = Behavior.scoreRates(counts, baseline)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.contains("brand_new"), "unseen type dropped from the monitor")
    val nw = got("brand_new")
    assert(nw.getLong(2) == 50L && nw.isNullAt(3) && nw.isNullAt(4))
    assert(!got("seen").isNullAt(3)) // scored types still score
  }

  test("transitions: per-user lag pairs, per-prev normalization, ts tie broken by event_id") {
    def ts2(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = Seq(
      // user 1: a -> b -> a -> c   (pairs: a>b, b>a, a>c)
      (1L, "a", ts2(0), 1L), (1L, "b", ts2(10), 2L),
      (1L, "a", ts2(20), 3L), (1L, "c", ts2(30), 4L),
      // user 2: a -> b  with EQUAL timestamps; event_id orders them
      (2L, "b", ts2(0), 6L), (2L, "a", ts2(0), 5L),
      // user 3: single event — contributes no pair
      (3L, "c", ts2(0), 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Behavior.transitions(events)
      .orderBy($"prev_type", $"next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // a: 2 pairs to b (u1, u2), 1 to c; b: 1 to a
    assert(got == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
    // rows with the same prev sum to ~1
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-5)
    }
  }
}
