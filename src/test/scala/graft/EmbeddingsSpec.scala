package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Embeddings

class EmbeddingsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("unitNormalize yields norm 1; zero vector unchanged") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.unitNormalize(df, "embedding")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Double])]
      .collect().toMap
    assert(math.abs(got(1L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(got(1L) == Seq(0.6, 0.8))
    assert(got(2L) == Seq(0.0, 0.0))
  }

  test("int8 quantization roundtrip error bounded by scale/2") {
    val vecs = spark.read
      .parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val q = Embeddings.quantizeInt8(vecs, "embedding")
    val checked = q.select(
      col("scale"),
      array_max(zip_with(
        Embeddings.dequantize(col("qvec"), col("scale")),
        transform(col("embedding"), _.cast("double")),
        (a, b) => abs(a - b))).as("max_err"),
      array_max(transform(col("qvec"), x => abs(x.cast("int")))).as("max_q"))
    val bad = checked
      .where(col("max_err") > col("scale") / 2 + lit(1e-9) || col("max_q") > 127)
      .count()
    assert(bad == 0)
  }
}
