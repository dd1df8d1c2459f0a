package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Transpose
import graft.schema.SchemaModel.FieldSpec

/** Golden fixtures F1/F2 from FIXTURES.md (recorded in the reference
  * notebooks — `data_transpose.ipynb` cell 16, `schema_generator.ipynb:1584`).
  */
class TransposeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("F1 single-key pivot matches notebook golden") {
    val in = Seq((123L, "AAA", 101.44), (123L, "BBB", 345.44), (1234L, "AAA", 458.44))
      .toDF("ID", "CLASS", "SALES")
    val out = Transpose(in, Seq("ID"), "CLASS", Seq("SALES"))
    assert(out.columns.toSeq === Seq("ID", "AAA_SALES", "BBB_SALES"))
    val rows = out.orderBy("ID").collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(rows === Seq(
      (123L, Some(101.44), Some(345.44)),
      (1234L, Some(458.44), None))) // NULL-fill for missing combo
  }

  test("F2 multi-key pivot matches recorded notebook output") {
    val in = Seq(
      (123L, 111L, "AAA", 101.44),
      (123L, 111L, "BBB", 345.44),
      (1234L, 1231L, "AAA", 458.44),
      (1234L, 123L, "BBB", 48.34),
      (1234L, 123L, "AAA", 418.64)).toDF("ID", "ID2", "CLASS", "SALES")
    val out = Transpose(in, Seq("ID", "ID2"), "CLASS", Seq("SALES"))
    assert(out.columns.toSeq === Seq("ID", "ID2", "AAA_SALES", "BBB_SALES"))
    val rows = out.orderBy("ID", "ID2").collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(rows === Seq(
      (123L, 111L, Some(101.44), Some(345.44)),
      (1234L, 123L, Some(418.64), Some(48.34)),
      (1234L, 1231L, Some(458.44), None))) // nan in the notebook = NULL
  }

  test("multi-value pivot names columns {pivotValue}_{valueField}") {
    val in = Seq((1L, "X", 1.0, 10.0), (1L, "Y", 2.0, 20.0))
      .toDF("ID", "P", "V1", "V2")
    val out = Transpose(in, Seq("ID"), "P", Seq("V1", "V2"))
    assert(out.columns.toSeq === Seq("ID", "X_V1", "X_V2", "Y_V1", "Y_V2"))
    assert(out.collect().head.toSeq === Seq(1L, 1.0, 10.0, 2.0, 20.0))
  }

  test("grouping is by real key tuple, not string concat (SURVEY §2.9(f))") {
    // (12,3) vs (1,23): string-concat key would conflate them
    val in = Seq((12L, 3L, "A", 1.0), (1L, 23L, "A", 2.0)).toDF("ID", "ID2", "P", "V")
    val out = Transpose(in, Seq("ID", "ID2"), "P", Seq("V"))
    assert(out.count() === 2)
  }

  test("outputSchema: keys REQUIRED, pivot columns NULLABLE") {
    val in = StructType(Seq(
      StructField("ID", LongType), StructField("CLASS", StringType),
      StructField("SALES", DoubleType)))
    val s = Transpose.outputSchema(in, Seq("ID"), Seq("SALES"), Seq("AAA", "BBB"))
    assert(s === StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("AAA_SALES", DoubleType),
      StructField("BBB_SALES", DoubleType))))
  }

  test("withEnforcedSchema applies the derived dynamic schema (K4)") {
    val in = Seq((123L, "AAA", 101.44)).toDF("ID", "CLASS", "SALES")
    val out = Transpose.withEnforcedSchema(in, Seq("ID"), "CLASS", Seq("SALES"))
    assert(!out.schema("ID").nullable && out.schema("AAA_SALES").nullable)
  }

  test("pivot value cap guards the driver (SURVEY §4.3)") {
    val in = (1 to 50).map(i => (1L, s"P$i", 1.0)).toDF("ID", "P", "V")
    assertThrows[IllegalArgumentException] {
      Transpose(in, Seq("ID"), "P", Seq("V"), maxPivotValues = 10)
    }
  }

  test("pivot invariants on duplicate-free input (SURVEY §5.2)") {
    val keys = (1L to 20L)
    val pvs = Seq("A", "B", "C")
    val in = (for { k <- keys; p <- pvs if (k + p.head).toInt % 3 != 0 }
      yield (k, p, k * 1.5)).toDF("ID", "P", "V")
    val out = Transpose(in, Seq("ID"), "P", Seq("V"))
    assert(out.count() === in.select("ID").distinct().count())
    assert(out.columns.length === 1 + pvs.length)
    // un-pivot restores exactly the non-null input rows
    val restored = pvs.map(p =>
      out.select($"ID", org.apache.spark.sql.functions.lit(p).as("P"), out(s"${p}_V").as("V"))
        .where(out(s"${p}_V").isNotNull))
      .reduce(_.unionByName(_))
    assert(restored.except(in.toDF()).count() === 0 && in.toDF().except(restored).count() === 0)
  }

  test("untranspose inverts transpose (roundtrip, single and multi value)") {
    val in = (for { k <- 1L to 20L; p <- Seq("A", "B", "C") if (k + p.head).toInt % 3 != 0 }
      yield (k, p, k * 1.5, k * 2.0)).toDF("ID", "P", "V1", "V2")
    val piv = Transpose(in, Seq("ID"), "P", Seq("V1", "V2"))
    val back = Transpose.untranspose(piv, Seq("ID"), "P", Seq("V1", "V2"))
    assert(back.columns.toSeq === Seq("ID", "P", "V1", "V2"))
    assert(back.except(in.toDF()).count() === 0 && in.toDF().except(back).count() === 0)
  }

  test("untranspose keeps NULL-fill rows when dropIfAllNull = false") {
    val in = Seq((1L, "A", 1.0), (2L, "A", 2.0), (2L, "B", 3.0)).toDF("ID", "P", "V")
    val piv = Transpose(in, Seq("ID"), "P", Seq("V"))
    val all = Transpose.untranspose(piv, Seq("ID"), "P", Seq("V"), dropIfAllNull = false)
    assert(all.count() === 4) // 2 keys × 2 pivot values, incl. the fabricated (1, B)
    assert(all.where($"ID" === 1L && $"P" === "B" && $"V".isNull).count() === 1)
  }

  test("untranspose matches the longest valueCol suffix") {
    // "price" is a suffix of "sum_price": columns must split on the longer one
    val df = Seq((1L, 10.0, 20.0)).toDF("ID", "X_sum_price", "X_price")
    val out = Transpose.untranspose(df, Seq("ID"), "P", Seq("sum_price", "price"))
    assert(out.columns.toSeq === Seq("ID", "P", "sum_price", "price"))
    val r = out.collect().head
    assert(r.getString(1) === "X" && r.getDouble(2) === 10.0 && r.getDouble(3) === 20.0)
  }
}
