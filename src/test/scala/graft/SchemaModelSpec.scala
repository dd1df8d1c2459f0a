package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaModel
import graft.schema.SchemaModel.FieldSpec

class SchemaModelSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("compact string schema parses (reference csv_to_bq.py:7 form)") {
    val s = SchemaModel.fromCompactString("ID:INTEGER,CLASS:STRING,SALES:FLOAT")
    assert(s === StructType(Seq(
      StructField("ID", LongType),
      StructField("CLASS", StringType),
      StructField("SALES", DoubleType))))
  }

  test("compact round-trip") {
    val s = "A:INTEGER,B:STRING,C:FLOAT,D:TIMESTAMP"
    assert(SchemaModel.toCompactString(SchemaModel.fromCompactString(s)) === s)
  }

  test("field specs honor REQUIRED/NULLABLE modes") {
    val s = SchemaModel.fromFieldSpecs(Seq(
      FieldSpec("ID", "INTEGER", "REQUIRED"), FieldSpec("CLASS", "STRING", "NULLABLE")))
    assert(!s("ID").nullable && s("CLASS").nullable)
  }

  test("enforceSchema coerces string columns and re-asserts nullability (SURVEY §1.2)") {
    import spark.implicits._
    val raw = Seq(("1", "AAA", "10.5"), ("2", "BBB", "20.0")).toDF("ID", "CLASS", "SALES")
    val target = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("CLASS", StringType),
      StructField("SALES", DoubleType)))
    val out = SchemaModel.enforceSchema(raw, target, strictNullability = true)
    assert(out.schema === target)
    assert(out.orderBy("ID").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      === Seq((1L, 10.5), (2L, 20.0)))
  }

  test("enforceSchema reorders columns to the declared order") {
    import spark.implicits._
    val raw = Seq((10.5, 1L)).toDF("SALES", "ID")
    val target = StructType(Seq(
      StructField("ID", LongType), StructField("SALES", DoubleType)))
    assert(SchemaModel.enforceSchema(raw, target).columns.toSeq === Seq("ID", "SALES"))
  }
}
