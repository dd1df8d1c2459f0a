package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz

/** Behavioral analytics over an event stream: ordered funnels and cohort
  * retention. The reference's weblog pipeline (reference `pipeline.py:13-31`)
  * stops at per-key mean duration; these are the two next questions every
  * event warehouse asks of the same (user, ts, type) shape.
  *
  * Scale shape: both operators are a single hash shuffle on `user_id`
  * (the natural high-cardinality key — parallelism scales with users, not
  * with event types or weeks), followed by tiny aggregations over the
  * per-user results. No windows over low-cardinality partitions, no joins
  * against the full event table.
  */
object Behavior {

  /** Strict ordered funnel: for each user, stage i counts only if an event
    * of `stages(i)` happened strictly AFTER the user's stage-(i-1) time —
    * first-touch semantics (the earliest qualifying event per stage).
    *
    * One `groupBy(user)` pass builds the per-user sorted (ts, type) array;
    * a left fold over it computes the chain of stage timestamps. The fold
    * is an interpreted HOF, but it runs on the post-aggregation per-user
    * rows (|users| rows, not |events|), after the only shuffle. Events per
    * user is bounded in practice (sessions, not corpora); a user's full
    * history must fit in one aggregation buffer, same contract as
    * sessionize/collect_list.
    *
    * Output: one row per stage — (stage_idx, stage, users) with users =
    * how many users reached that stage in order.
    */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", maxEventsPerUser: Int = 1000000): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val reached = stageReach(events, stages, userCol, tsCol, typeCol,
      maxEventsPerUser)

    // Tiny final aggregate: per-stage user counts (stages rows total).
    val aggCols = stages.indices.map(i =>
      count(element_at(col("r"), i + 1)).as(s"s$i"))
    val counts = reached.agg(aggCols.head, aggCols.tail: _*)
    val stageRows = explode(array(stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("stage_idx"), lit(st).as("stage"), col(s"s$i").as("users"))
    }: _*))
    counts.select(stageRows.as("x")).select(col("x.*"))
  }

  /** The shared first-touch chain both funnel views read: one row per
    * user with `r` = the per-stage reach timestamps (acc(i) = earliest
    * time stage i was reached respecting order, null if never) —
    * [[funnel]] counts them, [[funnelLatency]] differences them. One
    * definition so the two can never disagree about chain semantics.
    */
  private def stageReach(events: DataFrame, stages: Seq[String],
      userCol: String, tsCol: String, typeCol: String,
      maxEventsPerUser: Int): DataFrame = {
    val relevant = events
      .where(col(typeCol).isin(stages.map(lit): _*))
      .select(col(userCol), col(tsCol), col(typeCol))

    // Per user: sorted event history (struct sort = ts-major order), then
    // fold to the chained stage-reach timestamps. acc(i) = earliest time
    // stage i was reached respecting order, null if not (yet) reached.
    // The per-user-buffer contract fails LOUDLY: a user (usually a bot)
    // whose relevant history exceeds `maxEventsPerUser` raises with an
    // actionable message in-plan, instead of OOMing a task downstream.
    val history = relevant
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("et")))).as("h0"))
      .withColumn("h",
        when(size(col("h0")) <= maxEventsPerUser, col("h0"))
          .otherwise(raise_error(concat(
            lit("funnel: user "), col(userCol).cast("string"),
            lit(s" has more than $maxEventsPerUser relevant events; a " +
              "user's full history must fit one aggregation buffer — " +
              "pre-filter bot users or raise maxEventsPerUser")))))
      .drop("h0")

    val init = array(stages.map(_ => lit(null).cast("timestamp")): _*)
    val step = (acc: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) => {
      // For each stage i: set acc(i) if unset, the event matches stages(i),
      // and stage i-1 is already set with an earlier timestamp.
      val updated = stages.zipWithIndex.map { case (st, i) =>
        val prevOk =
          if (i == 0) lit(true)
          else element_at(acc, i).isNotNull && e("ts") > element_at(acc, i)
        when(element_at(acc, i + 1).isNull && e("et") === st && prevOk, e("ts"))
          .otherwise(element_at(acc, i + 1))
      }
      array(updated: _*)
    }
    history.withColumn("r", aggregate(col("h"), init, step))
  }

  /** Time-to-convert between consecutive funnel stages — the question
    * after [[funnel]]'s "how many": how LONG does the step take? Per
    * converting user the latency is the exact integer-microsecond
    * difference of the shared first-touch chain's stage timestamps
    * ([[stageReach]] — one definition with funnel, the two cannot
    * disagree); per stage pair the percentiles run through
    * `Stats.percentiles`, the adaptive exact machinery that buffers
    * small sets in one task and range-partitions big ones — never a
    * users-sized `collect_list` per group. One extra driver action per
    * pair (the pair count), bounded by |stages|.
    *
    * Output: one row per consecutive pair — (stage_from, stage_to, n,
    * p50_us, p90_us), percentile columns null when no user converted.
    */
  def funnelLatency(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      maxEventsPerUser: Int = 1000000): DataFrame = {
    require(stages.size >= 2, "funnelLatency needs at least two stages")
    val reached = stageReach(events, stages, userCol, tsCol, typeCol,
      maxEventsPerUser)
    graft.Lifecycle.withCachedInputs(reached) {
      val pairs = stages.indices.dropRight(1).map { i =>
        val lat = reached
          .where(element_at(col("r"), i + 2).isNotNull)
          .select((unix_micros(element_at(col("r"), i + 2))
            - unix_micros(element_at(col("r"), i + 1))).as("lat_us"))
        val n = lat.count()
        graft.operators.Stats.percentiles(lat, "lat_us", Seq(0.5, 0.9),
            names = Seq("p50_us", "p90_us"))
          .select(lit(stages(i)).as("stage_from"),
            lit(stages(i + 1)).as("stage_to"), lit(n).as("n"),
            col("p50_us"), col("p90_us"))
      }
      pairs.reduce(_.unionByName(_))
    }
  }

  /** Most common length-`n` consecutive event paths ("user journeys"):
    * per user, events ordered by time form a sequence; every window of
    * `n` consecutive event types is a path occurrence. Top-`topK` paths
    * by count, ties broken by path string.
    *
    * The lead() window partitions by user — cardinality scales with the
    * data — and the path counts partial-aggregate map-side. Ties in `ts`
    * are broken by `event_id` so the sequence (and the output) is total.
    */
  def topEventPaths(events: DataFrame, n: Int = 3, topK: Int = 20,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(n >= 2 && topK >= 1, s"bad topEventPaths params n=$n topK=$topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = (1 until n).foldLeft(
      events.select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("__s0"))) { (d, i) =>
      d.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    steps
      .where((1 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(" > ", (0 until n).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  /** Rolling 7-day active users and stickiness (DAU / trailing WAU): the
    * exact rolling COUNT DISTINCT, computed without sketches — each
    * distinct (user, day) activity row explodes into the 7 future days it
    * contributes to, then one countDistinct per day. Shuffle volume is 7×
    * the distinct activity pairs (already tiny next to the raw events),
    * never 7× the events, and no range join / nested loop appears.
    * Days with activity only in their look-back (no DAU) are not emitted.
    */
  def rollingStickiness(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val activity = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val dau = activity.groupBy(col("d").as("day"))
      .agg(countDistinct(col("u")).as("dau"))
    val wau = activity
      .select(col("u"), explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy(col("day")).agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        roundz(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** Per-bucket z-score anomaly flags: each event's value is scored
    * against the mean/stddev of its (type, hour-of-day) bucket — the
    * seasonal-baseline outlier check every metrics pipeline runs.
    *
    * Buckets are types × 24 — a tiny stats frame that broadcast-joins
    * back, so the whole operator is one partial-agged shuffle plus a
    * narrow scoring map. Degenerate buckets (stddev 0 or a single row)
    * yield null z-scores, not infinities.
    */
  def valueAnomalies(events: DataFrame, z: Double = 3.0,
      typeCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    scoreAgainstBaseline(events,
      baselineStats(events, typeCol, tsCol, valueCol), z, typeCol, tsCol, valueCol)

  /** The (type, hour-of-day) baseline: mean and sample stddev per bucket.
    * Types × 24 rows — broadcast-small by construction. Persist this from
    * history and feed `EventsStream.anomalyStream` for the streaming
    * (lambda) variant.
    */
  def baselineStats(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(typeCol), hour(col(tsCol)).as("__h"))
      .agg(avg(col(valueCol)).as("__mu"), stddev_samp(col(valueCol)).as("__sd"))

  /** Score rows against a prebuilt baseline (see `baselineStats`) — the
    * stateless half of the anomaly check, shared by batch and streaming.
    *
    * LEFT join: an event whose (type, hour) bucket the baseline has never
    * seen — a brand-new event type arriving on the stream — keeps its row
    * with a null z-score (same as a degenerate bucket), instead of being
    * silently dropped. Those are exactly the rows an operator wants to see.
    */
  def scoreAgainstBaseline(events: DataFrame, baseline: DataFrame,
      z: Double = 3.0, typeCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(z > 0, s"z=$z must be positive")
    val zscore = when(col("__sd") > 0,
      (col(valueCol) - col("__mu")) / col("__sd")).otherwise(lit(null))
    events
      .join(broadcast(baseline),
        events(typeCol) === baseline(typeCol) && hour(col(tsCol)) === col("__h"),
        "left")
      .drop(baseline(typeCol))
      .withColumn("zscore", zscore)
      .withColumn("is_anomaly", abs(col("zscore")) > z)
      .drop("__h", "__mu", "__sd")
  }

  /** Weekly cohort retention: users are cohorted by the week of their first
    * event; cell (cohort_week, week_offset) counts distinct cohort users
    * active offset weeks later. The standard retention triangle.
    *
    * Plan: distinct (user, week) activity and per-user first week are both
    * aggregations keyed on user — one shuffle each on the same key, then a
    * co-partitioned join (no extra exchange under AQE since both sides hash
    * on user), then a tiny groupBy over (cohort, offset) cells.
    */
  def weeklyRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // cohort granularity is a calendar week — a DATE, not a timestamp
    // (also what DuckDB's date_trunc('week', ...) yields on ns inputs)
    val week = date_trunc("week", col(tsCol)).cast("date")
    val activity = events.select(col(userCol).as("u"), week.as("w")).distinct()
    val firstWeek = activity.groupBy(col("u")).agg(min(col("w")).as("w0"))
    activity.join(firstWeek, "u")
      .groupBy(col("w0").as("cohort_week"),
        floor(datediff(col("w"), col("w0")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("u")).as("users"))
  }

  /** Lag-debounce: drop an event when the key's PREVIOUS event (by
    * `tsCol`, `tieBreak` for equal timestamps) is within `gapSec` — the
    * standard collapse for double-clicks, retry storms, and sensor
    * chatter before sessionization or counting. Lag semantics
    * (gap measured from the previous RAW event, not the previous kept
    * one) are the window-expressible approximation every SQL engine
    * replays identically; true chain-debounce needs per-key state
    * (`dropDuplicatesWithinWatermark` is the streaming cousin).
    *
    * Comparison runs in EXACT integer microseconds (`unix_micros`) —
    * a timestamp→double cast loses sub-µs precision and a boundary gap
    * could flip between engines. One shuffle by key; at any corpus size
    * the window carries one lag value per row.
    */
  def debounce(events: DataFrame, keys: Seq[String], tsCol: String,
      gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapSec > 0, s"debounce: gapSec=$gapSec must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).toIndexedSeq: _*)
    events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .where(col("__prev").isNull ||
        unix_micros(col(tsCol)) - col("__prev") > gapSec * 1000000L)
      .drop("__prev")
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next_type | prev_type) from consecutive event pairs, ordered by
    * (ts, tieBreak) within each user — the path-analysis summary behind
    * "what do users do after X" and the generator for synthetic-journey
    * simulators. The heavy work is one hash shuffle on the USER key
    * (parallelism scales with users); the probability normalization runs
    * as a window over the |types|² count rows — bounded by the type
    * vocabulary, never by the event volume. Probabilities round to 6
    * after an exact long-count division, so any engine replays them from
    * the same pairs. Output: (prev_type, next_type, n, p).
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieBreak.map(col)).toIndexedSeq: _*)
    val counts = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    counts.withColumn("p",
      roundz(col("n").cast("double") / sum(col("n")).over(byPrev), 6))
  }

  /** Event-RATE anomalies — [[valueAnomalies]]' volume-level sibling: a
    * burst or outage shows up as an hour whose event COUNT sits far from
    * that type's own per-hour distribution, even when every value is
    * normal. One map-side-combined count per (type, hour) — the only
    * row-sized pass — then the per-type moments come from EXACT integer
    * sums (n, Σc, Σc²; variance = (Σc² − (Σc)²/n)/(n−1) on those longs),
    * never a float accumulation whose summation order could differ
    * between engines. z rounds to 6 BEFORE the |z| ≥ `zThresh` flag
    * (round-before-threshold rule); types with < 2 hours or zero
    * variance flag null, not false — no distribution to stand out from.
    *
    * Output: (event_type, hour, n, z, anomaly) per observed hour.
    */
  def rateAnomalies(events: DataFrame, zThresh: Double = 2.0,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val counts = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    scoreRates(counts, rateBaseline(counts, typeCol), zThresh, typeCol)
  }

  /** The frozen half of the rate monitor: per-type EXACT integer moments
    * (bucket count, Σn, Σn²) of an observed per-hour count table.
    * Persist this from history and feed `EventsStream.rateAnomalyStream`
    * — the lambda split [[baselineStats]] already has for values.
    */
  def rateBaseline(counts: DataFrame, typeCol: String = "event_type"): DataFrame =
    counts.groupBy(col(typeCol)).agg(
      count(lit(1)).as("__k"),
      sum(col("n")).as("__s"),
      sum(col("n") * col("n")).as("__ss"))

  /** Score an (type, hour, n) count table against a [[rateBaseline]] —
    * the stateless half shared verbatim by the batch query (x143) and
    * the streaming twin, so the two can never drift on the arithmetic.
    * Variance comes from the exact integer sums; the k=1 guard wraps
    * the DIVISION itself, not just the consumer: under ANSI mode an
    * unconditional (k-1) divisor raises on single-bucket types before
    * any downstream when() sees the row.
    *
    * The baseline is LEFT-joined: a type the baseline has never seen (a
    * brand-new event type arriving in the stream) still surfaces, with
    * `z`/`anomaly` null — the same "cannot score" signal degenerate
    * (k<2) types carry — instead of silently vanishing from the
    * monitor. Downstream alerting that wants unseen-type = alarm keys
    * on `z IS NULL AND n > 0` with a baseline-membership check.
    */
  def scoreRates(counts: DataFrame, baseline: DataFrame,
      zThresh: Double = 2.0, typeCol: String = "event_type"): DataFrame = {
    require(zThresh > 0, s"scoreRates: zThresh=$zThresh must be positive")
    val varExpr = when(col("__k") >= 2,
      (col("__ss").cast("double")
        - col("__s").cast("double") * col("__s").cast("double") / col("__k"))
        / (col("__k") - 1))
    counts.join(broadcast(baseline), Seq(typeCol), "left")
      .withColumn("__mu", col("__s").cast("double") / col("__k"))
      .withColumn("__var", varExpr)
      .withColumn("z",
        when(col("__k") >= 2 && col("__var") > 0,
          roundz((col("n") - col("__mu")) / sqrt(col("__var")), 6)))
      .withColumn("anomaly",
        when(col("z").isNotNull, abs(col("z")) >= zThresh))
      .select(col(typeCol), col("hour"), col("n"), col("z"), col("anomaly"))
  }

  /** Frequent co-occurring event-type pairs — the A-priori level-2 pass
    * (Agrawal & Srikant, VLDB'94, public) over behavioral logs: which
    * two behaviors appear in the SAME user's history in at least
    * `minSupport` of all users. The market-basket affinity table, with
    * users as baskets and event types as items (at production scale the
    * item space is page/product ids — thousands to millions of types).
    *
    * Scale shape: baskets collapse ONCE to distinct (user, type) —
    * map-side combined, the only corpus-sized shuffle — and the pair
    * expansion is a self-join CO-PARTITIONED on user after it
    * ([[graft.functions.TextStats.pmiPairs]]' shape, never a cross
    * join). `maxBasket` excludes degenerate baskets up front (a bot
    * touching k types contributes C(k,2) pairs); the support
    * denominator rides as a broadcast one-row aggregate, and the
    * support threshold compares the ROUNDED ratio so the boundary row
    * cannot flip between engines.
    */
  def frequentTypePairs(events: DataFrame, minSupport: Double,
      maxBasket: Int = 1000, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(minSupport > 0 && minSupport <= 1 && maxBasket >= 2,
      s"frequentTypePairs: minSupport=$minSupport maxBasket=$maxBasket")
    val d2 = baskets(events, maxBasket, userCol, typeCol)
    graft.Lifecycle.withCachedInputs(d2) {
      val total = d2.agg(countDistinct(col("__u")).as("__n"))
      d2.select(col("__u"), col("__t").as("type_a"))
        .join(d2.select(col("__u"), col("__t").as("type_b")), Seq("__u"))
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(total))
        .withColumn("support",
          roundz(col("n_users").cast("double") / col("__n"), 6))
        .where(col("support") >= minSupport)
        .select(col("type_a"), col("type_b"), col("n_users"), col("support"))
    }
  }

  /** Distinct (user, type) baskets with the degenerate-basket guard —
    * shared by [[frequentTypePairs]] and [[associationRules]].
    */
  private def baskets(events: DataFrame, maxBasket: Int, userCol: String,
      typeCol: String): DataFrame = {
    val d = events.select(col(userCol).as("__u"), col(typeCol).as("__t"))
      .distinct()
    val ok = d.groupBy(col("__u")).agg(count(lit(1)).as("__k"))
      .where(col("__k") <= maxBasket).select(col("__u"))
    d.join(ok, Seq("__u"), "left_semi")
  }

  /** Directed association rules A→B over the same baskets (the
    * support/confidence/lift completion of [[frequentTypePairs]],
    * Agrawal & Srikant VLDB'94, public): confidence = P(B|A) =
    * n(A∧B)/n(A), lift = P(B|A)/P(B) — "users who did A also do B, and
    * how much more than base rate". Same scale shape as the undirected
    * pass (one distinct-basket shuffle, user-co-partitioned pair join,
    * `maxBasket` guard); per-type counts and the user total ride as a
    * broadcast side. All ratios derive from exact integer counts —
    * support is rounded BEFORE the threshold compare, and lift
    * multiplies raw counts in one fixed expression order, so the
    * boundary rows cannot flip between engines.
    */
  def associationRules(events: DataFrame, minSupport: Double,
      maxBasket: Int = 1000, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(minSupport > 0 && minSupport <= 1 && maxBasket >= 2,
      s"associationRules: minSupport=$minSupport maxBasket=$maxBasket")
    val d2 = baskets(events, maxBasket, userCol, typeCol)
    graft.Lifecycle.withCachedInputs(d2) {
      val total = d2.agg(countDistinct(col("__u")).as("__n"))
      val perType = d2.groupBy(col("__t")).agg(count(lit(1)).as("__nt"))
      d2.select(col("__u"), col("__t").as("type_a"))
        .join(d2.select(col("__u"), col("__t").as("type_b")), Seq("__u"))
        .where(col("type_a") =!= col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_users"))
        .join(broadcast(perType.select(col("__t").as("type_a"),
          col("__nt").as("__na"))), Seq("type_a"))
        .join(broadcast(perType.select(col("__t").as("type_b"),
          col("__nt").as("__nb"))), Seq("type_b"))
        .crossJoin(broadcast(total))
        .withColumn("support",
          roundz(col("n_users").cast("double") / col("__n"), 6))
        .where(col("support") >= minSupport)
        .select(col("type_a"), col("type_b"), col("n_users"), col("support"),
          roundz(col("n_users").cast("double") / col("__na"), 6)
            .as("confidence"),
          roundz(col("n_users").cast("double") * col("__n") /
            (col("__na").cast("double") * col("__nb")), 6).as("lift"))
    }
  }
}
