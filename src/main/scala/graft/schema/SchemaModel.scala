package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema model for the engine.
  *
  * The reference declares schemas in two BigQuery-flavored forms (SURVEY §1.2):
  *   - compact strings: `"ID:INTEGER,CLASS:STRING,SALES:FLOAT"`
  *     (reference `csv_to_bq.py:7`, `pipeline_csv_bq_template.py:11`)
  *   - dict field lists with `name`/`type`/`mode`
  *     (reference `data_transpose.py:11-27`, `csv_to_bq_NYC.py:10-26`)
  *
  * Only three scalar types appear in the reference; we map them to Spark as
  * INTEGER→LongType (BigQuery INTEGER is 64-bit), FLOAT→DoubleType,
  * STRING→StringType, and keep the REQUIRED/NULLABLE mode as
  * `StructField.nullable`. A handful of extra type names are accepted so the
  * same parser covers the driver testdata (timestamps etc.).
  */
object SchemaModel {

  /** One declared field: BigQuery-ish (name, type-name, mode). */
  final case class FieldSpec(name: String, typeName: String, mode: String = "NULLABLE") {
    def dataType: DataType = typeFromName(typeName)
    def nullable: Boolean = mode.toUpperCase != "REQUIRED"
    def toStructField: StructField = StructField(name, dataType, nullable)
  }

  def typeFromName(t: String): DataType = t.trim.toUpperCase match {
    case "INTEGER" | "INT64" | "LONG" | "BIGINT" => LongType
    case "INT" | "INT32"                         => IntegerType
    case "FLOAT" | "FLOAT64" | "DOUBLE"          => DoubleType
    case "STRING" | "VARCHAR" | "TEXT"           => StringType
    case "BOOLEAN" | "BOOL"                      => BooleanType
    case "TIMESTAMP" | "DATETIME"                => TimestampType
    case "DATE"                                  => DateType
    case "BYTES" | "BINARY"                      => BinaryType
    case other => throw new IllegalArgumentException(s"unknown type name: $other")
  }

  def typeName(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType | FloatType                        => "FLOAT"
    case StringType                                    => "STRING"
    case BooleanType                                   => "BOOLEAN"
    case TimestampType                                 => "TIMESTAMP"
    case DateType                                      => "DATE"
    case BinaryType                                    => "BYTES"
    case other                                         => other.simpleString.toUpperCase
  }

  /** Parse a compact string schema `"A:INTEGER,B:STRING"` → StructType.
    * All fields NULLABLE, matching the BigQuery default the reference relies
    * on (`csv_to_bq.py:7` declares no modes).
    */
  def fromCompactString(s: String): StructType =
    StructType(parseCompact(s).map(_.toStructField))

  def parseCompact(s: String): Seq[FieldSpec] =
    s.split(",").toSeq.filter(_.trim.nonEmpty).map { part =>
      part.split(":").map(_.trim) match {
        case Array(n, t)    => FieldSpec(n, t)
        case Array(n, t, m) => FieldSpec(n, t, m)
        case _ => throw new IllegalArgumentException(s"bad field spec: '$part'")
      }
    }

  def toCompactString(schema: StructType): String =
    schema.fields.map(f => s"${f.name}:${typeName(f.dataType)}").mkString(",")

  /** Dict-style field specs → StructType (reference `data_transpose.py:11-27`). */
  def fromFieldSpecs(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(_.toStructField))

  def toFieldSpecs(schema: StructType): Seq[FieldSpec] =
    schema.fields.toSeq.map(f =>
      FieldSpec(f.name, typeName(f.dataType), if (f.nullable) "NULLABLE" else "REQUIRED"))

  /** Enforce a declared schema on a DataFrame: project to the declared column
    * order and cast to declared types.
    *
    * This is the Spark home of the reference's sink-side string→type coercion
    * (`csv_to_bq.py:45-48`: values flow as strings, the BigQuery load job
    * coerces) and of the dynamic-schema sink K4.
    *
    * Cast-only projection: stays inside whole-stage codegen, no shuffle.
    *
    * `strictNullability` additionally stamps the declared REQUIRED modes onto
    * the plan metadata (pivot/union silently widen nullability). That path
    * rebuilds the DataFrame over the underlying RDD — a
    * serialization boundary that kills codegen fusion across it — so it is
    * opt-in metadata fidelity for sink boundaries, never for mid-pipeline
    * hot paths.
    */
  def enforceSchema(df: DataFrame, schema: StructType, strictNullability: Boolean = false): DataFrame = {
    val projected = df.select(schema.fields.map(f => castTo(col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
    if (!strictNullability || projected.schema == schema) projected
    else {
      // Restamping REQUIRED without validating would let real nulls through
      // to surface as NPEs far from the cause — fail fast, name the column.
      // The guard lives in the value path (not a side column Catalyst would
      // prune): null in a REQUIRED field hits raise_error at row eval.
      import org.apache.spark.sql.functions.{raise_error, when, lit}
      val guarded = projected.select(schema.fields.map { f =>
        if (f.nullable) col(f.name)
        else when(col(f.name).isNotNull, col(f.name))
          .otherwise(raise_error(lit(s"null in REQUIRED column '${f.name}'")).cast(f.dataType))
          .as(f.name)
      }.toIndexedSeq: _*)
      df.sparkSession.createDataFrame(guarded.rdd, schema)
    }
  }

  private def castTo(c: Column, dt: DataType): Column = c.cast(dt)
}
