package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.schema.SchemaModel
import graft.schema.SchemaModel.FieldSpec

/** Dynamic transpose (pivot) — the reference's flagship operator (SURVEY §2.4 A6).
  *
  * Semantics (defined by the working reference variants + notebook goldens):
  *   - input rows `(keyCols..., pivotCol, valueCols...)`
  *   - one output row per distinct key tuple
  *     (reference `data_transpose_working_2.py:96-115`; we group on the real
  *     column tuple, not the reference's accidental string-concat key —
  *     SURVEY §2.9(f))
  *   - one output column per (distinct pivot value × value column), named
  *     `{pivotValue}_{valueCol}` (`data_transpose_working_1.py:103,121`)
  *   - missing (key, pivotValue) combos → NULL
  *     (golden `nan` at `schema_generator.ipynb:1584`)
  *   - duplicate combos → unspecified survivor, like the reference's
  *     last-write-wins dict merge post-shuffle (SURVEY §2.9(e)); we use
  *     `first(value)`
  *   - output column order: keys first, then pivot values sorted ascending
  *     (golden `ID, ID2, AAA_SALES, BBB_SALES` at `schema_generator.ipynb:1564`)
  *   - output schema modes: keys keep input type REQUIRED, pivot columns take
  *     the value column's type NULLABLE (`data_transpose_working_1.py:76-106`)
  *
  * Execution shape — identical to the reference's two coordinated subgraphs
  * (SURVEY §3.2) but planned by Spark:
  *   job 1 discovers distinct pivot values (the reference's schema branch);
  *   job 2 runs partial+final pivot aggregation (the data branch). Passing
  *   the discovered values to `pivot(col, values)` bakes them into the plan
  *   the way the reference's schema side input parameterizes its sink.
  *
  * Scale notes: the pivot agg is a hash aggregate on the key columns — one
  * shuffle, map-side partial aggregation included. Distinct-value discovery
  * aggregates to #distinct values, tiny by construction; `maxPivotValues`
  * guards the driver against a high-cardinality pivot column (mirrors
  * BigQuery's 10k column cap, SURVEY §4.3).
  */
object Transpose {

  val DefaultMaxPivotValues = 10000

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      pivotCol: String,
      valueCols: Seq[String],
      maxPivotValues: Int = DefaultMaxPivotValues): DataFrame = {
    val values = discoverPivotValues(df, pivotCol, maxPivotValues)
    withValues(df, keyCols, pivotCol, valueCols, values)
  }

  /** Job 1 / schema branch: sorted distinct pivot values. Aggregates down to
    * the value set before anything reaches the driver.
    */
  def discoverPivotValues(df: DataFrame, pivotCol: String, max: Int = DefaultMaxPivotValues): Seq[String] = {
    val vals = df
      .select(col(pivotCol).cast("string").as(pivotCol))
      .where(col(pivotCol).isNotNull)
      .distinct()
      .orderBy(col(pivotCol))
      .limit(max + 1)
      .collect()
      .map(_.getString(0))
      .toSeq
    require(
      vals.size <= max,
      s"pivot column '$pivotCol' has more than $max distinct values; raise maxPivotValues explicitly")
    vals
  }

  /** Job 2 / data branch: pivot with a known value list (no discovery job). */
  def withValues(
      df: DataFrame,
      keyCols: Seq[String],
      pivotCol: String,
      valueCols: Seq[String],
      pivotValues: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "transpose needs at least one key column")
    require(valueCols.nonEmpty, "transpose needs at least one value column")
    val aggs: Seq[Column] = valueCols.map(v => first(col(v)).as(v))
    val pivoted = df
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .pivot(col(pivotCol).cast("string"), pivotValues)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    // Spark names multi-agg pivot columns `{pivotValue}_{aggAlias}` and
    // single-agg ones just `{pivotValue}`; normalize both to the reference's
    // `{pivotValue}_{valueCol}` convention (P6).
    val renamed =
      if (valueCols.size == 1) {
        val v = valueCols.head
        pivotValues.foldLeft(pivoted)((d, pv) => d.withColumnRenamed(pv, s"${pv}_$v"))
      } else pivoted // multi-agg: Spark already emits {pivotValue}_{alias}
    // Column order: keys first, then pivot values ascending × valueCols.
    val outCols = keyCols ++ pivotValues.flatMap(pv => valueCols.map(v => s"${pv}_$v"))
    renamed.select(outCols.map(col).toIndexedSeq: _*)
  }

  /** Output schema per the reference's schema branch: keys REQUIRED with
    * their input type, pivot columns NULLABLE with the value column's type
    * (`data_transpose_working_1.py:76-106`).
    */
  def outputSchema(
      input: StructType,
      keyCols: Seq[String],
      valueCols: Seq[String],
      pivotValues: Seq[String]): StructType = {
    def fld(n: String) = input.fields(input.fieldIndex(n))
    val keys = keyCols.map(k => FieldSpec(k, SchemaModel.typeName(fld(k).dataType), "REQUIRED"))
    val pvs = for {
      pv <- pivotValues
      v  <- valueCols
    } yield FieldSpec(s"${pv}_$v", SchemaModel.typeName(fld(v).dataType), "NULLABLE")
    SchemaModel.fromFieldSpecs(keys ++ pvs)
  }

  /** Inverse of the transpose (melt/unpivot): columns named
    * `{pivotValue}_{valueCol}` fold back into one row per (key tuple,
    * pivot value). Pivot values are recovered from the column names, so
    * this inverts exactly the naming convention `withValues` emits. Rows
    * where every value column is NULL are dropped by default — those are
    * the combos the pivot fabricated as NULL-fill — giving the §5.2
    * property `untranspose(transpose(df)) == df` on duplicate-free input
    * (asserted in TransposeSpec).
    *
    * Execution shape: array-of-structs + explode — a narrow generator in
    * one codegen stage. No shuffle at any scale; output is ~|pivotValues|×
    * the input rows, streamed, never materialized per-task.
    */
  def untranspose(df: DataFrame, keyCols: Seq[String], pivotCol: String,
      valueCols: Seq[String], dropIfAllNull: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "untranspose needs at least one value column")
    // longest-suffix match so one valueCol being a suffix of another
    // ("price" vs "sum_price") can't mis-split a column name
    val bySuffix = valueCols.sortBy(-_.length)
    val pivotValues = df.columns.filterNot(keyCols.contains).flatMap { c =>
      bySuffix.collectFirst { case v if c.endsWith(s"_$v") => c.dropRight(v.length + 1) }
    }.distinct.toIndexedSeq
    require(pivotValues.nonEmpty, "no {pivotValue}_{valueCol} columns found to untranspose")
    val rows = array(pivotValues.map { pv =>
      struct(lit(pv).as(pivotCol) +: valueCols.map(v => col(s"${pv}_$v").as(v)): _*)
    }: _*)
    val exploded = df
      .select(keyCols.map(col).toIndexedSeq :+ explode(rows).as("__r"): _*)
      .select(keyCols.map(col).toIndexedSeq ++
        (pivotCol +: valueCols).map(n => col(s"__r.$n")): _*)
    if (dropIfAllNull)
      exploded.where(valueCols.map(v => col(v).isNotNull).reduce(_ || _))
    else exploded
  }

  /** Full-fidelity port of the reference program: pivot then enforce the
    * dynamically-derived schema (K4's dynamic-schema sink becomes an
    * explicit enforceSchema step — SURVEY §2.7 K4).
    */
  def withEnforcedSchema(
      df: DataFrame,
      keyCols: Seq[String],
      pivotCol: String,
      valueCols: Seq[String]): DataFrame = {
    val values = discoverPivotValues(df, pivotCol)
    val out = withValues(df, keyCols, pivotCol, valueCols, values)
    SchemaModel.enforceSchema(out, outputSchema(df.schema, keyCols, valueCols, values),
      strictNullability = true) // sink boundary: REQUIRED key modes are part of K4 fidelity
  }
}
