package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's element-wise / join / aggregate operator inventory
  * (SURVEY §2.2-§2.5) as a library of DataFrame combinators. Everything is
  * built from `org.apache.spark.sql.functions` Column expressions — fully
  * codegen'd, no UDFs — so Catalyst keeps predicate pushdown, column pruning
  * and whole-stage codegen intact at any scale.
  */
object RelOps {

  /** Heavy per-row compute wants every core even when the input is one
    * small parquet file (one partition): fan out to default parallelism.
    * At cluster scale inputs already carry enough partitions, so this is a
    * no-op there — no shuffle of a 100 TB corpus. Shared by the shingling
    * pipelines (Dedup) and the media synth/decode passes (Multimodal).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe the physical partition count via the internal-row RDD — same
    // number as df.rdd but without building the row deserializer plan the
    // public .rdd conversion pays on every call
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** P2: positional→named projection (`dict(zip(names, values))`,
    * reference `csv_to_bq.py:17-19`). */
  def nameBind(df: DataFrame, names: Seq[String]): DataFrame =
    df.toDF(names: _*)

  /** P4: timestamp parse + duration seconds (reference `pipeline.py:11-20`,
    * format `%Y-%m-%dT%H:%M:%S`). Emits `(key, duration)`.
    */
  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss"
  def visitDuration(df: DataFrame, keyCol: String, startCol: String, endCol: String): DataFrame =
    df.select(
      col(keyCol),
      (unix_timestamp(to_timestamp(col(endCol), TsFormat)) -
        unix_timestamp(to_timestamp(col(startCol), TsFormat)))
        .cast("double")
        .as("duration"))

  /** P5: row → CSV line (`",".join(map(str, element))`, `pipeline.py:63`). */
  def toCsvLine(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(concat_ws(",", cols.map(c => col(c).cast("string")).toIndexedSeq: _*).as("line"))

  /** P8: case-insensitive equality filter (`Flask_app/main.py:25-29`). */
  def ciEquals(df: DataFrame, c: String, value: String): DataFrame =
    df.where(lower(col(c)) === lit(value.toLowerCase))

  /** P9: point lookup with defaults on miss (`Fast_API/main.py:25-36`).
    * Expressed as a left join of the query keys against the dimension, with
    * per-column defaults via coalesce — stays distributed (no collect), and
    * a small `keys` side broadcasts automatically.
    */
  def pointLookup(keys: DataFrame, dim: DataFrame, keyCol: String, defaults: Map[String, Column]): DataFrame = {
    val joined = keys.join(dim, Seq(keyCol), "left")
    val out = dim.columns.filter(_ != keyCol).map { c =>
      defaults.get(c).map(d => coalesce(col(c), d).as(c)).getOrElse(col(c))
    }
    joined.select(col(keyCol) +: out.toIndexedSeq: _*)
  }

  /** J1: broadcast hash lookup join (the reference's `AsDict` side-input
    * join, `pipeline.py:54-61`). Inner join — the reference KeyErrors on a
    * miss, and on its inputs every key is present (SURVEY §2.9(g)).
    */
  def broadcastLookup(facts: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    facts.join(broadcast(dim), on, "inner")

  /** J2: left enrichment join against a dimension
    * (`csv_to_bq_NYC.py:72-93`'s per-key HTTP fetch, collapsed to a join). */
  def enrich(facts: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    facts.join(broadcast(dim), on, "left")

  /** A1: count per key (`CombinePerKey(CountCombineFn)`, `csv_to_bq_NYC.py:134`). */
  def countPerKey(df: DataFrame, keys: Seq[String], as: String = "count"): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(count(lit(1)).as(as))

  /** A2: mean per key (`CombinePerKey(MeanCombineFn)`, `pipeline.py:62`). */
  def meanPerKey(df: DataFrame, keys: Seq[String], valueCol: String, as: String = "mean"): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(avg(col(valueCol)).as(as))

  /** A4: within-group distinct collect (`UniqueList`,
    * `data_transpose_working_2.py:90-93`), deterministic via sort_array. */
  def distinctPerKey(df: DataFrame, keys: Seq[String], valueCol: String, as: String = "values"): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(sort_array(collect_set(col(valueCol))).as(as))

  /** U1: union by name (`beam.Flatten()`, `data_transpose_working_1.py:186-191`). */
  def union(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** Bucket space for `hashBucket` — 1e6 buckets gives fraction resolution
    * of 1e-6, plenty for sampling rates.
    */
  val HashSampleBuckets = 1000000L

  /** Knuth multiplicative hash of a numeric key → bucket in
    * [0, HashSampleBuckets). The key is masked to 31 bits first so the
    * product can't overflow a long under ANSI mode. Pure arithmetic — any
    * engine implementing the same formula selects the same rows (the DuckDB
    * oracle does), which `df.sample`'s partition-dependent RNG cannot offer.
    */
  def hashBucket(key: Column): Column =
    pmod(key.cast("long").bitwiseAND(lit(0x7FFFFFFFL)) * lit(2654435761L),
      lit(HashSampleBuckets))

  /** Deterministic sample: keep a row iff its key's hash bucket falls below
    * `fraction` of the bucket space. A narrow filter — no shuffle, no RNG
    * state, reproducible across runs/engines/partitionings; downsampling a
    * 100 TB corpus this way is a single scan that prunes at the reader.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction out of [0,1]")
    df.where(hashBucket(col(keyCol)) < lit((fraction * HashSampleBuckets).toLong))
  }

  /** Stratified deterministic sample: each stratum keeps its own fraction
    * (strata absent from the map keep nothing). Same single-scan shape as
    * `hashSample` — the per-stratum rate is a CASE expression, not a split
    * into per-stratum jobs.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0), "fractions out of [0,1]")
    val thresh = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === lit(stratum), lit((f * HashSampleBuckets).toLong)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < thresh)
  }

  /** Skew-resistant equi-join for a hot-keyed fact side: the dimension is
    * replicated `buckets`× with a salt column and facts pick a deterministic
    * salt from a row hash, so one hot key spreads over `buckets` reducers
    * instead of melting a single task. Use when a key holds >~1 partition's
    * worth of rows and AQE skew-join splitting isn't available (e.g. the
    * build side is too large to broadcast but the probe side is skewed).
    *
    * Cost: the dim shuffles buckets× larger — keep `buckets` small (8-32)
    * and the dim narrow. Results are identical to `facts.join(dim, on)`.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, on: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(buckets)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFacts.join(saltedDim, on :+ "__salt", joinType).drop("__salt")
  }

  /** Keyed diff of two table versions — the corpus-versioning audit:
    * every key classified `added` / `removed` / `changed` / `unchanged`
    * between `oldDf` and `newDf`, with content equality decided by a
    * sha2 over `compareCols` (nulls folded to a sentinel, so NULL vs
    * value reads as changed, NULL vs NULL as unchanged).
    *
    * Scale shape: each side reduces to (keys, 32-byte hash) BEFORE the
    * full-outer join, so the shuffle carries hashes, never content —
    * diffing two 100 TB corpus versions moves 2×(keys+hash) and nothing
    * else. Compose downstream: `groupBy(status)` for the audit counts,
    * `where(status = 'changed')` for the reprocess list.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: no compare columns")
    def hashed(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        sha2(concat_ws("|",
          compareCols.map(c => coalesce(col(c).cast("string"), lit(" "))): _*),
          256).as(as): _*)
    hashed(oldDf, "__h_old")
      .join(hashed(newDf, "__h_new"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** [[snapshotDiff]] across a SCHEMA CHANGE — the versioned store
    * serves every version with its OWN schema (time travel), so a diff
    * spanning an evolved commit must not read "this version has a new
    * column" as "every row changed": content equality is decided over
    * the non-key columns the two versions SHARE (sorted for a
    * deterministic hash input), and columns present on one side only
    * are surfaced to the caller via [[schemaDelta]] instead of
    * polluting the row classification. A key present in both versions
    * with equal shared-column content is `unchanged` even though the
    * new version carries a column the old one lacks.
    */
  def evolvedSnapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    val common = oldDf.columns.toSeq.intersect(newDf.columns.toSeq)
      .filterNot(keys.contains).sorted
    require(common.nonEmpty,
      s"evolvedSnapshotDiff: versions share no non-key columns " +
        s"(${oldDf.columns.toSeq} vs ${newDf.columns.toSeq})")
    snapshotDiff(oldDf, newDf, keys, common)
  }

  /** The schema change between two table versions, as data: per column
    * that is not common to both, one row (column, side) with side
    * `added` (new version only) or `removed` (old version only) —
    * the audit companion of [[evolvedSnapshotDiff]].
    */
  def schemaDelta(oldDf: DataFrame, newDf: DataFrame): Seq[(String, String)] = {
    val o = oldDf.columns.toSet
    val n = newDf.columns.toSet
    ((n -- o).toSeq.sorted.map(_ -> "added") ++
      (o -- n).toSeq.sorted.map(_ -> "removed"))
  }

  /** Apply a CDC changelog to produce the current snapshot: keep the
    * LATEST operation per key (ordered by `seqCols`, e.g. a commit
    * timestamp plus a change id as tiebreak) and drop keys whose latest
    * op is the delete marker — the standard changelog→table
    * materialization (Debezium/binlog compaction semantics; upserts win,
    * tombstones erase).
    *
    * One shuffle by key, with the per-key rank bounded map-side by
    * Spark's WindowGroupLimit pushdown (rn = 1 → each task keeps one
    * candidate per key before the exchange). `Catalog.upsert` is the
    * two-table flavor (merge a batch INTO a stored target); this is the
    * log-only flavor — replay any prefix of the log, get that moment's
    * table, no target needed.
    *
    * `seqCols` must totally order each key's ops or "latest" is
    * nondeterministic — include a unique change id after the timestamp.
    */
  def cdcApply(log: DataFrame, keys: Seq[String], seqCols: Seq[String],
      opCol: String, deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "cdcApply: no sequence columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= lit(deleteOp))
      .drop("__rn")
  }

  /** Contiguous deterministic row ids 1..n in `sortCols` order — the
    * surrogate-key assignment every corpus snapshot wants, WITHOUT the
    * single-task global window `row_number() OVER (ORDER BY ...)` plans
    * at any scale: range-partition on the sort key (the distributed
    * sort), count rows per partition (one bounded collect — #partitions
    * rows, never data), turn the counts into per-partition offsets on
    * the driver, and number within each partition by a window
    * PARTITIONED BY partition id — every stage parallel, nothing
    * row-sized on one task. Partition boundaries from range sampling
    * may move between runs, but the ids don't: the global order is
    * boundary-independent as long as `sortCols` is a TOTAL order
    * (caller contract, same as cdcApply's seqCols — include a unique
    * id after the semantic keys).
    */
  def assignStableIds(df: DataFrame, sortCols: Seq[String],
      as: String = "row_id", startAt: Long = 1L): DataFrame = {
    require(sortCols.nonEmpty, "assignStableIds: no sort columns")
    val sorted = df
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    graft.Lifecycle.withCachedInputs(sorted) {
      val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
        .orderBy(col("__pid"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      // exclusive prefix sums in pid order = each partition's id offset
      val offs = counts.map(_._1)
        .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
      val spark = df.sparkSession
      import spark.implicits._
      val offDf = offs.toSeq.toDF("__pid", "__off")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid"))
        .orderBy(sortCols.map(col): _*)
      sorted.join(broadcast(offDf), Seq("__pid"))
        .withColumn(as,
          col("__off") + row_number().over(w) + lit(startAt - 1L))
        .drop("__pid", "__off")
    }
  }

  /** EXACT inner-join output size — computed WITHOUT running the join:
    * |A ⋈ B| = Σ_k c_A(k)·c_B(k) over per-key counts. The pre-flight
    * check before a 100 TB shuffle join: the counts tables are one
    * map-side-combined aggregation each (|keys| rows, not |rows|), their
    * join is keys-sized, and the answer says whether the real join is
    * safe, explosive (a runaway fanout key), or skewed (one key
    * dominating the output — [[keySkew]]'s join-shaped cousin, feeding
    * the same salting decision). Row counts ride out of the same
    * aggregates, so the whole diagnostic is one pass over each input.
    *
    * Output, one row: (n_left, n_right, n_keys_joined, n_join,
    * fanout = n_join/n_left round-6, top_key as string, top_key_rows) —
    * top_key is the single largest contributor (ties: largest key),
    * null when the join is empty.
    */
  def joinSizeEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val cl = left.groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__nl"))
    val cr = right.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__nr"))
    val prod = cl.join(cr, Seq("__k"))
      .select(col("__k"), (col("__nl") * col("__nr")).as("__p"))
    val totals = prod.agg(
      count(lit(1)).as("n_keys_joined"),
      coalesce(sum(col("__p")), lit(0L)).as("n_join"),
      // single aggregate carries the winner: max on (rows, key-string)
      // → largest contributor, ties broken on the larger key string;
      // null over an empty join (no fake zero row to special-case)
      max(struct(col("__p").as("p"), col("__k").cast("string").as("k")))
        .as("__top"))
    val nl = cl.agg(coalesce(sum(col("__nl")), lit(0L)).as("n_left"))
    val nr = cr.agg(coalesce(sum(col("__nr")), lit(0L)).as("n_right"))
    nl.crossJoin(broadcast(nr)).crossJoin(broadcast(totals))
      .select(col("n_left"), col("n_right"), col("n_keys_joined"),
        col("n_join"),
        graft.functions.Num.roundz(
          col("n_join").cast("double") / col("n_left"), 6).as("fanout"),
        col("__top.k").as("top_key"), col("__top.p").as("top_key_rows"))
  }
}
