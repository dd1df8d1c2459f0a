package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundz

/** Temporal / ordering-aware joins Spark has no built-in operator for:
  * as-of (most-recent-prior match) and interval/range joins.
  *
  * Both are composed from built-in expressions + window aggregates so the
  * plans stay codegen'd and shuffle-bounded:
  *   - as-of: ONE hash-partition shuffle on the key (union + running
  *     `last(ignoreNulls)` window), never a per-row probe or a join
  *     explosion — the 100 TB shape for "latest dimension state as of
  *     event time" lookups.
  *   - range: interval tables small enough to broadcast use a broadcast
  *     nested-loop with a range predicate (no shuffle at all); big-big
  *     range joins bucketize the domain so the join is equi on bucket id
  *     and the range predicate only refines within-bucket candidates.
  */
object Temporal {

  /** Backward (most-recent-prior, inclusive) as-of join.
    *
    * For each left row, append `payload` columns from the right row with
    * the greatest `rightTs <= leftTs` sharing the same `keys` (null when no
    * prior right row exists) — e.g. "the user's last purchase before this
    * click". Ties on timestamp match (inclusive); among right rows with the
    * same key and timestamp the survivor is the last under the window sort,
    * so keep (key, rightTs) unique for deterministic output.
    *
    * Shape: tag + union both sides, one window
    * `last(struct(payload), ignoreNulls)` over
    * `(partitionBy keys, orderBy ts, side)` running frame, filter back to
    * left rows. Right rows sort before left rows at equal timestamps, which
    * is what makes the match inclusive. The payload travels as ONE nullable
    * struct so genuinely-null payload values don't fall through to older
    * rows.
    *
    * Cost: one shuffle of |left|+|right| rows on `keys` — no range
    * explosion, no skew from popular join keys beyond what the window sort
    * already absorbs. This beats the union-of-inequality-join plans
    * (O(left × right-per-key)) that a naive SQL translation produces.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(struct((rightTs +: payload).map(col): _*)).schema.head.dataType))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct((rightTs +: payload).map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // align: right side lacks the non-key left columns; fill with nulls
    val rAligned = leftCols.foldLeft(r) { (d, c) =>
      if (keys.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = leftCols.map(col) ++
      (col("__m").getField(rightTs).as(s"$prefix$rightTs") +:
        payload.map(p => col("__m").getField(p).as(s"$prefix$p")))
    matched.select(out: _*)
  }

  /** Half-open validity intervals from a version boundary list: each
    * version row gains `__valid_to` = the NEXT version's valid-from (the
    * provided `horizon` for the newest version), turning a (version,
    * valid_from) history into the interval table a point-in-time
    * dimension lookup range-joins against ([[broadcastRangeJoin]] —
    * facts never shuffle for the version pick). The global window is
    * safe by construction: the input is a version HISTORY — one row per
    * committed version, never data-sized.
    */
  def validityIntervals(versions: DataFrame, validFromCol: String,
      horizon: Column): DataFrame = {
    val w = Window.orderBy(col(validFromCol))
    versions.withColumn("__valid_to",
      coalesce(lead(col(validFromCol), 1).over(w), horizon))
  }

  /** Interval join against a BROADCAST-sized interval table: rows of
    * `facts` matched to `intervals` rows where
    * `loCol <= valueCol < hiCol` (half-open). Plan: BroadcastNestedLoopJoin
    * — zero shuffle; right for band/bucket dimension tables (price bands,
    * SLA tiers, date ranges) of up to ~thousands of rows.
    */
  def broadcastRangeJoin(facts: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      joinType: String = "inner"): DataFrame =
    facts.join(broadcast(intervals),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol), joinType)

  /** Big-big interval join: bucketize the value domain with `bucketWidth`
    * so the join is EQUI on bucket id (hash-partitioned, AQE-planned), and
    * the range predicate refines within the bucket. Each interval explodes
    * to ceil(len/width)+1 bucket rows; each fact row lands in exactly one
    * bucket, so no post-join dedup is needed.
    *
    * Pick `bucketWidth` near the typical interval length: shorter wastes
    * interval replication, longer inflates per-bucket candidate lists.
    */
  def bucketedRangeJoin(facts: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val fb = facts.withColumn("__bkt", floor(col(valueCol) / bucketWidth))
    val ib = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor((col(hiCol) - lit(1e-9)) / bucketWidth))))
    fb.join(ib, Seq("__bkt"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bkt")
  }

  /** Daily resample with gap fill: aggregate events to (key, day), generate
    * each key's full day grid between its first and last observation
    * (`sequence` + explode — grid rows are built distributed, never on the
    * driver), left-join the observed days back, 0-fill counts, and carry
    * the last observed daily value forward (LOCF) with an
    * ignore-nulls `last` over an unbounded-preceding frame.
    *
    * Scale: one shuffle for the daily aggregate, one for the span agg
    * (tiny: a row per key), one hash join grid⋈daily co-partitioned on
    * (key, day). Grid size = keys × their active spans — bounded by the
    * calendar, not the event rate.
    */
  def gapFillDaily(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"), roundz(sum(col(valueCol)), 2).as("day_value"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        roundz(coalesce(last(col("day_value"), ignoreNulls = true).over(w),
          lit(0.0)), 2).as("carried_value"))
  }

  /** SCD Type-2 dimension builder: a change log (one row per observed
    * state, keyed + timestamped) becomes validity intervals — consecutive
    * rows with an UNCHANGED tracked value collapse into one interval, each
    * surviving row is effective from its timestamp until the next change
    * (`eff_to` null = current version).
    *
    * Two windows, both partitioned by the (high-cardinality) key — no
    * global sort, scales horizontally like any per-key window. Value
    * comparison is null-safe (`<=>`): a tracked value transitioning
    * to/from NULL is a change. `tieBreak` must make the per-key ordering
    * total or interval boundaries are nondeterministic.
    */
  /** Incremental SCD2 merge: fold a new batch of change events into an
    * existing SCD2 table WITHOUT rebuilding unaffected history — the
    * standing CDC maintenance job once the dimension is too large to
    * rebuild nightly.
    *
    * Shape: keys untouched by the batch pass through AS-IS (anti join —
    * zero recompute); for affected keys only, the existing interval
    * starts replay as a change log (eff_from is exactly the surviving
    * change's timestamp, and scd2 output retains every other input
    * column, so the replay is lossless), union the batch, and re-run
    * `scd2`. Cost scales with the batch's key footprint, not the table.
    *
    * Contract (guarded in-plan, loud): batch changes must be strictly
    * LATER than the affected key's newest existing version — including
    * a final CLOSED interval's end (a tombstoned key's delete ts).
    * Out-of-order arrivals can flip which historical rows collapsed as
    * no-ops, which an incremental replay cannot reconstruct — rebuild
    * those keys from the raw log instead. Under the contract,
    * `scd2Merge(scd2(a), b) == scd2(a ∪ b)` exactly (TemporalSpec pins
    * this; the x75 oracle recomputes the full rebuild in SQL).
    *
    * TOMBSTONES: an interval table produced by [[scd2]] with
    * `deleteCol` encodes deletions as GAPS (a row's eff_to not equal
    * to the key's next eff_from, or a closed final interval). The
    * eff_from-only replay cannot see them, so merging would silently
    * resurrect a deleted span when a later re-insert carries the
    * pre-delete values. Pass the SAME `deleteCol` here: the replay
    * reconstructs one delete row per gap (at the gap's start — exactly
    * the original delete's ts) and re-runs [[scd2]] tombstone-aware,
    * keeping `scd2Merge(scd2(a), b) == scd2(a ∪ b)` for tombstoned
    * inputs (TemporalSpec pins delete → value-equal re-insert across
    * the merge). With `deleteCol = None`, an affected key that carries
    * a gap fails LOUDLY in-plan instead of merging wrongly.
    */
  def scd2Merge(existing: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "scd2Merge needs keys and tracked values")
    require(Seq("eff_from", "eff_to", "is_current").forall(existing.columns.contains),
      "scd2Merge: 'existing' must be an scd2 output (eff_from/eff_to/is_current); " +
        s"got columns [${existing.columns.mkString(", ")}]")
    deleteCol.foreach(c => require(batch.columns.contains(c),
      s"scd2Merge: deleteCol '$c' not in the batch (columns " +
        s"[${batch.columns.mkString(", ")}]) - the batch must carry the " +
        "delete flag so new tombstones merge through the same column"))
    val affectedKeys = batch.select(keyCols.map(col): _*).distinct()
    val untouched = existing.join(affectedKeys, keyCols, "left_anti")
    val affected = existing.join(affectedKeys, keyCols, "left_semi")
    // a fully-deleted key's newest event is its delete (= max eff_to),
    // later than any eff_from — the batch must postdate that too
    val latest = affected.groupBy(keyCols.map(col): _*)
      .agg(max(greatest(col("eff_from"),
        coalesce(col("eff_to"), col("eff_from")))).as("__max_from"))
    val guarded = batch.join(latest, keyCols, "left")
      .withColumn(tsCol,
        when(col("__max_from").isNull || col(tsCol) > col("__max_from"), col(tsCol))
          .otherwise(raise_error(concat(
            lit(s"scd2Merge: batch change at or before the newest existing "),
            lit(s"version for its key (column '$tsCol'); out-of-order merges "),
            lit("cannot be replayed incrementally - rebuild the affected "),
            lit("keys from the raw change log")))))
      .drop("__max_from")
    // deletion gap: this interval closed and no interval opens at its
    // end — the span [eff_to, next eff_from) had no entity
    val wNext = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col("eff_from") +: tieBreak.map(col)).toIndexedSeq: _*)
    val flagged = affected.withColumn("__gap",
      col("eff_to").isNotNull &&
        !(col("eff_to") <=> lead(col("eff_from"), 1).over(wNext)))
    val replayedBase = deleteCol match {
      case None =>
        flagged.withColumn("eff_from",
          when(!col("__gap"), col("eff_from")).otherwise(raise_error(lit(
            "scd2Merge: 'existing' carries deletion gaps (a tombstoned " +
              "scd2 output) but no deleteCol was passed - the replay " +
              "would silently resurrect deleted spans; pass the same " +
              "deleteCol as the original scd2, or rebuild the affected " +
              "keys from the raw change log"))))
          .drop("__gap")
      case Some(c) =>
        val live = flagged.drop("__gap").withColumn(c, lit(false))
        // one synthesized delete per gap, at the closed interval's end —
        // the original delete row's exact ts; its tracked values ride
        // along unused (scd2 drops delete rows from the output)
        val dels = flagged.where(col("__gap"))
          .withColumn("eff_from", col("eff_to"))
          .drop("__gap").withColumn(c, lit(true))
        live.unionByName(dels)
    }
    val replayed = replayedBase
      .drop("eff_to", "is_current")
      .withColumnRenamed("eff_from", tsCol)
    val merged = scd2(
      replayed.select(guarded.columns.map(col).toIndexedSeq: _*).unionByName(guarded),
      keyCols, tsCol, valueCols, tieBreak, deleteCol)
    untouched.unionByName(merged)
  }

  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tieBreak: Seq[String] = Seq.empty,
      deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "scd2 needs keys and tracked values")
    val ord = (col(tsCol) +: tieBreak.map(col)).toIndexedSeq
    val wOrd = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val changed = valueCols
      .map(v => !(col(v) <=> lag(col(v), 1).over(wOrd)))
      .reduce(_ || _)
    // TOMBSTONES (deleteCol): a delete change CLOSES the entity's open
    // interval at its ts and opens none — the key is simply absent for
    // the span until a re-insert. A delete (and the first row after
    // one) always breaks the run REGARDLESS of tracked values: a
    // re-insert carrying the pre-delete values would otherwise compare
    // value-equal across the gap and silently collapse the deletion.
    // The delete row rides through the run/lead machinery (so the
    // previous interval's eff_to lands on the delete ts) and is dropped
    // from the output at the end.
    val isDel = deleteCol.fold(lit(false))(c => coalesce(col(c), lit(false)))
    // A key's first row must survive EXPLICITLY: when its tracked values
    // are all null, `null <=> lag(=null)` is TRUE and the <=>-based change
    // test alone would drop the entity's first validity interval.
    val runs = changes
      .withColumn("__del", isDel)
      .withColumn("__chg", row_number().over(wOrd) === 1 || changed ||
        col("__del") || coalesce(lag(col("__del"), 1).over(wOrd), lit(false)))
      .where(col("__chg"))
      .drop("__chg")
    val wRun = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).toIndexedSeq: _*)
    val iv = runs
      .withColumn("eff_from", col(tsCol))
      .withColumn("eff_to", lead(col(tsCol), 1).over(wRun))
      .withColumn("is_current", col("eff_to").isNull)
      .drop(tsCol)
    deleteCol.fold(iv.drop("__del"))(c =>
      iv.where(!col("__del")).drop("__del", c))
  }

  /** Temporal train/test split: rows at or before `cutoff` are `train`,
    * later rows `test` — the time-travel leakage guard next to the hash
    * split (x49, random-but-reproducible) and the cluster-keyed split
    * (x81, near-dup leakage): a model evaluated on the test side never
    * saw a FUTURE event at train time. A narrow per-row expression, no
    * shuffle. Downstream, `max(train ts) < min(test ts)` is the one-line
    * no-leak audit — assert it next to the split, not in a postmortem.
    */
  def temporalSplit(df: DataFrame, tsCol: String,
      cutoff: org.apache.spark.sql.Column, as: String = "split"): DataFrame =
    df.withColumn(as,
      when(col(tsCol) <= cutoff, lit("train")).otherwise(lit("test")))

  /** `temporalSplit` with the cutoff at the `trainFraction` percentile of
    * `tsCol` (one bounded percentile aggregate). Convenient for ad-hoc
    * exploration; pipelines that must be REPLAYED bit-for-bit by another
    * engine should pass an explicit cutoff to `temporalSplit` instead —
    * an interpolated percentile that lands within a float ulp of an
    * actual timestamp can flip that row's side between engines.
    */
  def temporalSplitAtFraction(df: DataFrame, tsCol: String,
      trainFraction: Double, as: String = "split"): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1,
      s"temporalSplitAtFraction: trainFraction=$trainFraction outside (0,1)")
    val cut = df
      .agg(expr(s"percentile(unix_micros($tsCol), $trainFraction)").as("__cut"))
    df.crossJoin(broadcast(cut))
      .withColumn(as,
        when(unix_micros(col(tsCol)).cast("double") <= col("__cut"),
          lit("train")).otherwise(lit("test")))
      .drop("__cut")
  }
}
