package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: evaluate N constraints over a table in
  * ONE aggregation pass (partial+final HashAggregate — no per-rule scan,
  * no driver loop), returning one row per rule with its violation count.
  *
  * Row rules are violation predicates evaluated per row; a NULL predicate
  * counts as a violation (a null price does not satisfy `price > 0`).
  * Uniqueness rules ride the same aggregation via
  * `count(*) − count(distinct key)`.
  *
  * The single wide row is melted to (rule, violations, pass) with `stack`
  * — still a Column expression, so the whole audit is scan → one
  * aggregation → constant-width projection at any table size.
  */
object Checks {

  /** @param rowRules (name, satisfied-predicate) pairs; a row violates the
    *   rule when the predicate is false OR null.
    * @param uniqueKeys (name, key columns) pairs; violations = number of
    *   surplus rows (count − distinct count). Rows with a NULL key column
    *   are not counted by `count(distinct ...)` — pair with a not-null row
    *   rule on the key.
    */
  def audit(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Seq.empty): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty, "audit needs at least one rule")
    val allNames = rowRules.map(_._1) ++ uniqueKeys.map(_._1)
    // rule names are interpolated into the stack() SQL below: a backtick
    // would escape the quoted identifier, and a duplicate name makes the
    // melted column ambiguous — both are caller bugs worth a clear error
    require(allNames.forall(!_.contains("`")),
      s"audit: rule names must not contain backticks: ${allNames.filter(_.contains("`"))}")
    require(allNames.distinct.size == allNames.size,
      s"audit: duplicate rule names: ${allNames.diff(allNames.distinct).distinct}")
    val rowAggs = rowRules.map { case (name, ok) =>
      sum(when(coalesce(ok, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
    }
    val uniqAggs = uniqueKeys.map { case (name, keys) =>
      (count(lit(1)) - count_distinct(col(keys.head), keys.tail.map(col): _*))
        .as(s"__v_$name")
    }
    val wide = df.agg((rowAggs ++ uniqAggs).head, (rowAggs ++ uniqAggs).tail: _*)
    val names = rowRules.map(_._1) ++ uniqueKeys.map(_._1)
    val stackArgs = names
      .map(n => s"'${n.replace("'", "''")}', `__v_$n`").mkString(", ")
    wide
      .select(expr(s"stack(${names.size}, $stackArgs) AS (rule, violations)"))
      .withColumn("violations", coalesce(col("violations"), lit(0L)))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Functional-dependency audit — does `keys` DETERMINE each dependent
    * column? [[audit]]'s uniqueness rule asks "is the key a key"; this
    * asks the subtler schema question behind denormalized 100 TB tables:
    * for every dependent d, how many key-groups carry MORE than one
    * distinct d (violating keys → d). A clean FD means d can be
    * normalized out / joined from a dim table; violations localize the
    * dirty keys. One groupBy(keys) pass computes every dependent's
    * per-group distinct count side by side (no per-rule scan); the final
    * per-rule rollup is rules × 1 rows. NULL dependents: count(distinct)
    * ignores nulls, so a group holding {x, NULL} counts 1 distinct —
    * null-vs-value conflicts are a row rule's job, not an FD's.
    *
    * Output: one row per dependent — (rule "keys->d", n_groups,
    * n_violating_groups, violation_share round-6, pass).
    */
  def fdAudit(df: DataFrame, keys: Seq[String], deps: Seq[String]): DataFrame = {
    require(keys.nonEmpty && deps.nonEmpty, "fdAudit: keys and deps required")
    require(deps.forall(!_.contains("`")), "fdAudit: no backticks in names")
    val perGroup = df.groupBy(keys.map(col): _*)
      .agg(count_distinct(col(deps.head)).as(s"__d_${deps.head}"),
        deps.tail.map(d => count_distinct(col(d)).as(s"__d_$d")): _*)
    val rollups = deps.flatMap { d =>
      Seq(sum(when(col(s"__d_$d") > 1, 1L).otherwise(0L)).as(s"__v_$d"))
    } :+ count(lit(1)).as("__g")
    val wide = perGroup.agg(rollups.head, rollups.tail: _*)
    val keyLabel = keys.mkString(",")
    val stackArgs = deps
      .map(d => s"'${(keyLabel + "->" + d).replace("'", "''")}', `__v_$d`")
      .mkString(", ")
    wide
      .select(col("__g"),
        expr(s"stack(${deps.size}, $stackArgs) AS (rule, n_violating)"))
      .select(col("rule"), col("__g").as("n_groups"),
        coalesce(col("n_violating"), lit(0L)).as("n_violating"),
        graft.functions.Num.roundz(
          coalesce(col("n_violating"), lit(0L)).cast("double") / col("__g"), 6)
          .as("violation_share"))
      .withColumn("pass", col("n_violating") === 0L)
  }

  /** Order-insensitive table fingerprint: one row of
    * (n_rows, fingerprint) where the fingerprint XOR-folds a per-row md5
    * content hash over the named columns. Row order, partitioning, file
    * layout, and storage format all drop out (XOR commutes), so two
    * copies of a table compare EQUAL after any repartition / compaction /
    * migration — the 100 TB equality check that needs no sort, no
    * shuffle of data, and no second scan of either side: each table folds
    * to 16 bytes locally (partial XOR per partition, one-row final
    * merge).
    *
    * Caveats, by design:
    *   - columns are concat-separated with an unescaped `|`; the hash is
    *     a CONTENT fingerprint, not a cryptographic commitment — a `|`
    *     inside a value can collide with a column boundary;
    *   - NULL is folded as a literal NUL (`\u0000`) sentinel (distinct from
    *     the empty string, so (NULL, "x") ≠ ("", "x"));
    *   - duplicate-row MULTIPLICITY parity is what XOR sees: a row
    *     appearing twice cancels out. `n_rows` catches pure duplication;
    *     callers needing full multiset equality add a count-distinct
    *     compare.
    *   - md5-derived (first 15 hex digits → 60 bits), so an external
    *     engine can replay the exact fingerprint in SQL.
    */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint: no columns")
    val rowHash = conv(substring(md5(concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)),
      1, 15), 16, 10).cast("long")
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(bit_xor(rowHash), lit(0L)).as("fingerprint"))
  }

  /** Population-stability-index drift between two snapshots of a numeric
    * column, per group — the DISTRIBUTION companion to `snapshotDiff`'s
    * key-level audit: x114 says WHICH rows changed between corpus
    * versions, this says whether a column's SHAPE moved (ingest bug,
    * upstream filter change, seasonal swing) even when every key churned.
    *
    * `PSI = Σ_bins (p_new − p_old) · ln(p_new / p_old)` over `nBins`
    * fixed-width bins on [lo, hi) (outside values clamp to the edge
    * bins — drift INTO the tails still registers). Proportions are
    * add-half smoothed, `p = (n_bin + 0.5) / (n + nBins/2)`, so empty
    * bins never divide by zero and the measure stays finite and exactly
    * replayable — no epsilon clamping whose cutoff an external engine
    * might round differently. Fixed [lo, hi) is deliberate: data-derived
    * bounds would make the bins themselves drift with the data, hiding
    * exactly the movement PSI is supposed to expose.
    *
    * The usual reading: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 act.
    *
    * Scale shape: one aggregation per side to (group, bin) counts —
    * map-side partials collapse each partition to ≤ groups×nBins rows
    * before the exchange — a full-outer align on (group, bin), a window
    * sum per group for the totals, and one final group-by. Nothing
    * row-sized ever reaches the driver or a single partition.
    *
    * Output: (groupCols..., psi, n_old, n_new); groups present in only
    * one snapshot keep their row (the other side's proportions are all
    * at the smoothed floor — maximal, finite drift).
    */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, nBins: Int,
      psiRound: Int = 6): DataFrame =
    psiFromCounts(
      binCounts(oldDf, groupCols, valueCol, lo, hi, nBins, "__co"),
      binCounts(newDf, groupCols, valueCol, lo, hi, nBins, "__cn"),
      groupCols, nBins, psiRound)

  /** (group, bin) histogram with clamped-edge fixed-width binning — the
    * one binning both PSI sides (and the streaming monitor's frozen
    * baseline, `DriftStream`) share, so bin boundaries can never drift
    * between the corpus that froze a baseline and the batches scored
    * against it. `as` names the count column.
    */
  def binCounts(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int, as: String): DataFrame = {
    require(nBins > 0, s"binCounts: nBins=$nBins must be positive")
    require(lo < hi, s"binCounts: empty range [$lo, $hi)")
    val width = (hi - lo) / nBins
    df.select(groupCols.map(col) :+
        least(greatest(
            floor((col(valueCol).cast("double") - lit(lo)) / lit(width)),
            lit(0.0)), lit((nBins - 1).toDouble)).cast("long").as("__bin"): _*)
      .groupBy(groupCols.map(col) :+ col("__bin"): _*)
      .agg(count(lit(1)).as(as))
  }

  /** PSI from two (group, bin) count frames (columns `__co` / `__cn` per
    * `binCounts`): full-outer bin align, add-half smoothing, the sum —
    * the estimator core `psiDrift` and `DriftStream.scoreAgainstBaseline`
    * share verbatim. Output (groupCols..., psi, n_old, n_new).
    */
  def psiFromCounts(oldCounts: DataFrame, newCounts: DataFrame,
      groupCols: Seq[String], nBins: Int, psiRound: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val aligned = oldCounts
      .join(newCounts, groupCols :+ "__bin", "full_outer")
      .select(gcols :+ col("__bin") :+
        coalesce(col("__co"), lit(0L)).as("__co") :+
        coalesce(col("__cn"), lit(0L)).as("__cn"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
    val half = nBins / 2.0
    val po = (col("__co").cast("double") + lit(0.5)) /
      (sum(col("__co")).over(w).cast("double") + lit(half))
    val pn = (col("__cn").cast("double") + lit(0.5)) /
      (sum(col("__cn")).over(w).cast("double") + lit(half))
    aligned
      .withColumn("__term", (pn - po) * log(pn / po))
      .groupBy(gcols: _*)
      .agg(graft.functions.Num.roundz(sum(col("__term")), psiRound).as("psi"),
        sum(col("__co")).as("n_old"), sum(col("__cn")).as("n_new"))
  }

  /** Cross-table referential-integrity audit — the FK pre-flight a
    * 100 TB join runs before trusting its key space: given a fact side
    * and a dimension side, one row of exact facts about the id
    * relationship (row counts, matched/unmatched distinct ids on each
    * side, and multiplicity — ids repeating on a side). `n_left_only_ids`
    * > 0 means the fact table references missing dimension rows (the
    * join silently drops or null-extends them); `n_right_only_ids` is
    * the dimension's dead weight; dup ids on the DIMENSION side mean the
    * join fans out.
    *
    * Scale: each side collapses to per-id counts first (map-side
    * combined — the only corpus-sized shuffles), the full-outer join is
    * id-keyed over those compacted frames, and the final aggregate is
    * bounded (one row).
    */
  def integrityAudit(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String): DataFrame = {
    val lc = left.select(col(leftId).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__ln"))
    val rc = right.select(col(rightId).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__rn"))
    lc.join(rc, Seq("__id"), "full_outer")
      .agg(
        sum(coalesce(col("__ln"), lit(0L))).as("n_left"),
        sum(coalesce(col("__rn"), lit(0L))).as("n_right"),
        count(when(col("__ln").isNotNull && col("__rn").isNotNull, 1))
          .as("n_matched_ids"),
        count(when(col("__ln").isNotNull && col("__rn").isNull, 1))
          .as("n_left_only_ids"),
        count(when(col("__ln").isNull && col("__rn").isNotNull, 1))
          .as("n_right_only_ids"),
        count(when(col("__ln") > 1, 1)).as("n_left_dup_ids"),
        count(when(col("__rn") > 1, 1)).as("n_right_dup_ids"))
  }
}
