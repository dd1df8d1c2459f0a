package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms for vector corpora: unit normalization and
  * symmetric int8 quantization (4× smaller than float32 at ~0.4% max
  * error) — at 100 TB the storage/shuffle saving IS the feature.
  *
  * All pure Column expressions over the array (no UDFs). Multi-referenced
  * derived values (norm, scale) are materialized with `withColumn` first:
  * higher-order functions are interpreted with no CSE, so an HOF lambda
  * must only reference cheap attributes (see SCALE.md).
  */
object Embeddings {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** L2 norm without the native vec_dot dependency (works in any session;
    * for hot ANN paths use Similarity.dot/vec_dot instead).
    */
  def l2(vec: Column): Column =
    sqrt(aggregate(asDouble(vec), lit(0.0d), (acc, x) => acc + x * x))

  /** Unit-normalize `vecCol` in place; all-zero vectors stay all-zero.
    * The norm is staged as its own attribute so the per-element divide
    * reads it instead of re-summing the array per element.
    */
  def unitNormalize(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__n", l2(col(vecCol)))
      .withColumn(vecCol,
        when(col("__n") === 0, asDouble(col(vecCol)))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("__n"))))
      .drop("__n")

  /** Symmetric per-vector int8 quantization: `scale = max|v| / 127`,
    * `q_i = round(v_i / scale)` ∈ [-127, 127] as tinyint. Adds `qCol`
    * (array<tinyint>) and `scaleCol` (double); zero vectors get scale 1.
    * Reconstruction error is bounded by scale/2 per element.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, qCol: String = "qvec",
      scaleCol: String = "scale"): DataFrame =
    df.withColumn("__mx", array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn(scaleCol,
        when(col("__mx") === 0, lit(1.0d)).otherwise(col("__mx") / 127.0d))
      .withColumn(qCol,
        transform(col(vecCol),
          x => round(x.cast("double") / col(scaleCol)).cast("tinyint")))
      .drop("__mx")

  /** Reconstruct doubles from an int8-quantized vector and its scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
