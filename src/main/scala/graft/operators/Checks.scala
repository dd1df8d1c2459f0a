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
}
