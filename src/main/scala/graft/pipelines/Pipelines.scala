package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextStats
import graft.operators.{Dedup, RelOps}
import graft.schema.SchemaModel
import graft.sources.Catalog

/** The reference's four pipeline programs, each as a pure
  * `DataFrame => DataFrame` core with a thin I/O shell (SURVEY §7.1 step 6).
  */
object Pipelines {

  /** Port of `pipeline.py` / `pipeline_csv_bq_template.py` (SURVEY §3.1):
    * weblog CSV → visit duration per ip → ip→country broadcast join →
    * mean duration per country.
    *
    * The reference's per-element HTTP geo lookup (`pipeline.py:22-29`) is a
    * broadcast join against an ip→country dimension (J1) — same boundary
    * structure: narrow map chain, broadcast exchange, one shuffle for the
    * final aggregate (partial mean map-side).
    *
    * Output schema `country:STRING, time_duration:FLOAT`
    * (`pipeline_csv_bq_template.py:11`).
    */
  def weblogMeanDurationByCountry(weblog: DataFrame, ipCountry: DataFrame): DataFrame = {
    val durations = RelOps.visitDuration(weblog, "ip", "visit_start", "visit_end")
    val joined = RelOps.broadcastLookup(durations, ipCountry, Seq("ip"))
    RelOps.meanPerKey(joined, Seq("country"), "duration", as = "time_duration")
  }

  /** Port of `csv_to_bq.py`: headered CSV with declared compact schema →
    * append to a catalog table. Values are read as strings and coerced at
    * the sink boundary, mirroring SURVEY §1.2.
    */
  def csvToTable(spark: SparkSession, csvPath: String, compactSchema: String,
      root: String, tableRef: String): Unit = {
    val raw = Catalog.csvAllStrings(spark, csvPath)
    val coerced = SchemaModel.enforceSchema(raw, SchemaModel.fromCompactString(compactSchema))
    Catalog.writeAppend(coerced, root, tableRef)
  }

  /** Core of `csv_to_bq_NYC.py` (SURVEY §2.1 S7 + §2.4 A1 + §2.3 J2):
    * listings → count per neighbourhood → left-join the neighbourhood
    * dimension → project output column order.
    *
    * Output: `neighbourhood, count_listings, population, house_price_sq_ft,
    * coll_edu_percentage` (`csv_to_bq_NYC.py:28-33`).
    */
  def nycNeighbourhoodCounts(listings: DataFrame, neighbourhoodDim: DataFrame): DataFrame = {
    val counts = RelOps.countPerKey(listings, Seq("neighbourhood"), as = "count_listings")
    RelOps
      .enrich(counts, neighbourhoodDim, Seq("neighbourhood"))
      .select("neighbourhood", "count_listings", "population", "house_price_sq_ft", "coll_edu_percentage")
  }

  /** The two serving apps' lookup semantics (SURVEY §3.3), as queries over
    * the dimension DataFrame — both are case-insensitive on the key.
    * Miss behavior differs per app (SURVEY §2.9(h)):
    */
  /** Pretraining curation: language filter → quality floor → exact dedup →
    * overlapping token chunks, composed from the individually-verified
    * operators (x6, x5, x1, x37) into ONE declarative flow.
    *
    * Composition is the scale story: the language and quality filters fuse
    * into a single codegen'd scan stage (no materialization between
    * "steps"), the dedup semi-join is the flow's only wide shuffle before
    * chunking, and Catalyst prunes `documents` columns the pipeline never
    * uses. A 100 TB corpus makes one pass, not four.
    */
  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", lang: String = "en",
      minQuality: Double = 0.5, chunkTokens: Int = 50,
      overlap: Int = 10): DataFrame = {
    // one tokenization feeds BOTH the language and quality gates (the
    // token array is a staged attribute; interpreted HOFs get no CSE)
    val langKept = docs
      .withColumn("__ltoks", TextStats.tokens(lower(col(textCol))))
      .withColumn("__lang", TextStats.langIdFromTokens(col("__ltoks")))
      .where(col("__lang") === lang)
    val qualityKept = TextStats
      .withQualityScoreFromTokens(langKept, textCol, "__ltoks", as = "__q")
      .where(col("__q") >= minQuality)
      .drop("__q", "__ltoks", "__lang")
    val deduped = Dedup.exact(qualityKept, idCol, textCol)
    TextStats.chunked(deduped, idCol, textCol, chunkTokens, overlap)
  }

  object Lookup {
    /** Flask variant (`Flask_app/main.py:21-29`): miss → echoed name + zeros. */
    def flask(dim: DataFrame, name: String): DataFrame =
      missDefault(dim, name, echoName = true)

    /** FastAPI variant (`Fast_API/main.py:25-36`): miss → "Not found" + zeros. */
    def fastapi(dim: DataFrame, name: String): DataFrame =
      missDefault(dim, name, echoName = false)

    private def missDefault(dim: DataFrame, name: String, echoName: Boolean): DataFrame = {
      val spark = dim.sparkSession
      import spark.implicits._
      import org.apache.spark.sql.types.{NumericType, StringType}
      val keyCol = dim.columns.head
      val missName = if (echoName) name else "Not found"
      val keys = Seq(name.toLowerCase).toDF("__qkey")
      val joined = keys.join(
        broadcast(dim.withColumn("__qkey", lower(col(keyCol)))), Seq("__qkey"), "left")
      // miss-default per column TYPE — lit(0) on a string column fails
      // analysis; the serving apps echo zeros for numerics, "" for strings
      val defaults = dim.schema.fields.map { f =>
        f.name -> (f.dataType match {
          case _: NumericType => lit(0).cast(f.dataType)
          case StringType     => lit("")
          case _              => lit(null).cast(f.dataType)
        })
      }.toMap
      val outCols = coalesce(col(keyCol), lit(missName)).as(keyCol) +:
        dim.columns.tail.map(c => coalesce(col(c), defaults(c)).as(c)).toIndexedSeq
      joined.select(outCols: _*)
    }
  }
}
