package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Numeric output normalization shared by every declared query.
  *
  * `roundz` is `round` plus IEEE signed-zero normalization: `-0.0 + 0.0`
  * is `+0.0` under round-to-nearest, and every other double is unchanged
  * by `+ 0.0`. Rounding a tiny negative quantity (a z-score, a slope, a
  * PMI, a cosine) can legitimately produce `-0.0`, and engines disagree
  * on when (round 5: DuckDB `round()` emitted `-0.0` where Spark emitted
  * `+0.0` on one row of 60k, failing the driver's serialized-value hash).
  * Convention: every rounded float that reaches a query output goes
  * through `roundz` on the Spark side and `(round(...) + 0)` in the
  * mirrored DuckDB oracle SQL, so both engines pin the same bit pattern.
  * Stays inside whole-stage codegen (Round + Add, both codegen'd).
  */
object Num {
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** Scale-0 variant (integral round kept as double before a cast). */
  def roundz(c: Column): Column = round(c) + lit(0.0)
}
