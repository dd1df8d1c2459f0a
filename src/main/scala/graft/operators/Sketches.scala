package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches as TABLES (SURVEY §7.5 — LLM-pipeline extension).
  *
  * A 100 TB token stream cannot afford an exact `groupBy(token)` when the
  * key space is open-ended (URLs, n-grams, user ids): the count table is
  * itself corpus-sized. A count-min sketch caps the state at `depth ×
  * width` counters regardless of input size — the classic
  * Cormode–Muthukrishnan structure — at the cost of one-sided error:
  * estimates never undercount, and overcount by at most the mass hashed
  * into the same counters.
  *
  * Engine fit: the sketch is a bounded DataFrame of `(r, b, c)` rows, not
  * a driver-side object — built with one hash-shuffled aggregation whose
  * map-side partial agg collapses each partition to ≤ depth×width rows
  * before the exchange, so the shuffle traffic is O(depth×width ×
  * nPartitions) no matter how many items stream through. Estimation is a
  * broadcast join of the bounded sketch against the probes — zero UDFs,
  * everything codegen'd column arithmetic, and two sketches of the same
  * shape MERGE by (r, b) count-sum (sketch linearity), which is how
  * per-day sketches roll up to a month without touching raw data.
  *
  * Two bucket hashers: [[xxhashBucket]] (default — one 64-bit xxhash64
  * per (item, row), the fast production path) and [[md5Bucket]] (the
  * repo's engine-portable md5 convention, same arithmetic as
  * `Training.hashSplit`) — with md5, any engine with an md5 function can
  * replay the ENTIRE sketch bit-for-bit, which is how the declared query
  * hash-matches its estimates against the DuckDB oracle instead of
  * settling for property flags.
  */
object Sketches {

  /** Row-`r` bucket hashers: (item, r) → bucket in [0, width). */
  type Hasher = (Column, Column, Int) => Column

  /** Fast default: fold the row index into one xxhash64. */
  val xxhashBucket: Hasher = (item, r, width) =>
    pmod(xxhash64(item, r), lit(width))

  /** Engine-portable md5 bucket (the `hashSplit` convention: first 8 hex
    * chars of md5 over the string form, here of `item:r`) — bit-identical
    * in any engine with md5, so an external oracle can recompute the
    * whole sketch. ~an order of magnitude more per-item cost than
    * xxhash64; pick it when cross-engine replay matters more than the
    * hash throughput.
    */
  val md5Bucket: Hasher = (item, r, width) =>
    conv(substring(md5(concat(item.cast("string"), lit(":"),
      r.cast("string"))), 1, 8), 16, 10).cast("long") % width

  private def rowSeeds(depth: Int): Column =
    array((0 until depth).map(lit): _*)

  /** Build the sketch table for an item column: `(r, b, c)` with
    * `r < depth`, `b < width`, `c` = how many input rows hash to that
    * counter. Missing (r, b) combinations are zero counters (sparse
    * representation — `cmsEstimate` coalesces them back).
    */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 256, hasher: Hasher = xxhashBucket): DataFrame = {
    require(depth > 0 && width > 0, s"cmsBuild: bad depth=$depth width=$width")
    items
      .select(col(itemCol).as("__it"), explode(rowSeeds(depth)).as("r"))
      .groupBy(col("r"), hasher(col("__it"), col("r"), width).as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge same-shape sketches by counter-wise sum (CMS linearity): the
    * rollup path — build per partition/day, merge without raw data.
    */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge: no sketches")
    sketches.reduce(_.unionByName(_)).groupBy(col("r"), col("b"))
      .agg(sum(col("c")).as("c"))
  }

  // ------------------------------------------------ HLL distinct sketches

  /** Per-group HLL sketch of `itemCol` (Apache DataSketches HllSketch via
    * Spark's native `hll_sketch_agg` — codegen'd aggregate, no UDF): one
    * shuffle whose map-side partial sketches cap executor exchange traffic
    * at O(groups × 2^lgK bytes) regardless of row count — the
    * count-distinct analog of [[cmsBuild]]'s bounded-state story.
    *
    * The sketch column is REUSABLE aggregation state: `hll_union_agg`
    * re-aggregates any subset of groups to a combined distinct estimate
    * without touching raw data (see [[hllUnionEstimate]]) — the rollup
    * property an exact `countDistinct` result can never offer, and the
    * reason warehouses store sketch columns next to their aggregates.
    */
  def hllGroupSketches(df: DataFrame, groupCol: String, itemCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("hll"))

  /** Distinct-count estimate of a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Union the group sketches and estimate the COMBINED distinct count —
    * one bounded fold over groups×sketch rows, no second pass over data.
    */
  def hllUnionEstimate(sketches: DataFrame, sketchCol: String = "hll"): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("hll_est"))

  /** Point-estimate the frequency of each probe row's `itemCol`:
    * `min over r of counter[r][bucket_r(item)]` — the count-min rule.
    * Guarantees (exact, not probabilistic): `est >= true count` always;
    * `est <= true count + (other mass colliding in the best row)`.
    * The sketch side is bounded (depth×width rows) and broadcast; the
    * probe side explodes by `depth` and re-collapses — no shuffle of the
    * probe stream beyond its own groupBy. Pass the SAME depth/width/
    * hasher the sketch was built with.
    */
  def cmsEstimate(probes: DataFrame, itemCol: String, sketch: DataFrame,
      depth: Int = 4, width: Int = 256,
      hasher: Hasher = xxhashBucket): DataFrame = {
    require(depth > 0 && width > 0, s"cmsEstimate: bad depth=$depth width=$width")
    val keyCols = probes.columns.map(col).toIndexedSeq
    probes
      .withColumn("r", explode(rowSeeds(depth)))
      .withColumn("b", hasher(col(itemCol), col("r"), width))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(keyCols: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
