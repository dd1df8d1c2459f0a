package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** STORED IVF-PQ index: the index as tables, not a session object.
  *
  * `ivfPqKnn` rebuilds its quantizer and codes per call — right for a
  * one-shot query, wrong for a serving corpus where the expensive part
  * (training + encoding 10^9+ vectors) should run ONCE and every query
  * batch after that should be training-free. This module makes the index
  * durable in the engine's native currency, parquet tables:
  *
  *   dir/centroids.parquet — (cell int, centroid array<double>), the
  *     coarse quantizer; nCentroids rows, collected/broadcast at serve;
  *   dir/books.parquet     — (sub int, code int, centroid array<double>),
  *     the PQ codebooks relationalized; m×k rows;
  *   dir/codes.parquet     — (id, pq array<int>) PARTITIONED BY cell: the
  *     inverted lists ARE the directory layout.
  *
  * Serving reads centroids+books (bounded: nCentroids + m×k rows), plans
  * the probe cells on the driver, and scans ONLY those cell directories —
  * the `cell IN (probes)` predicate is a static partition filter, so a
  * 16-cell index probed at nProbe=6 reads 6/16 of the codes on disk
  * (PlanSpec-pinned, same mechanism as the s9 date-pruned scan). At
  * cluster scale that is the difference between touching the whole index
  * and touching the shortlist's shard. ADC scoring + exact re-rank then
  * proceed exactly as `ivfPqKnn`'s in-session path: codes decode through
  * the broadcast codebooks, the rerank fetches raw vectors by id from the
  * corpus table.
  *
  * The same stored index serves differently-filtered queries (the
  * quantizer cannot move — it's on disk), completing the steady-state ANN
  * story the way `cosineLshIndex` does for the semantic-dedup family.
  */
object AnnIndex {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Build + write the index tables. One pass over `candidates` computes
    * each vector's cell (nearest stored centroid) and PQ codes; the codes
    * land partitioned by cell so serves prune at the directory level.
    *
    * `trainIters > 0` trains the quantizer with that many spherical
    * k-means rounds instead of the hash-order sample — trained cells
    * follow the corpus's direction clusters, a per-index cost amortized
    * over every serve. `spill > 1` writes each vector into its `spill`
    * nearest cells (index grows spill×): boundary vectors stay reachable
    * from their second-closest cell, which is where a single-assignment
    * IVF loses recall at low nProbe. The serve side collapses the
    * resulting duplicate (qid, nid) pairs.
    *
    * REBUILD BASELINE, not a production store: a crash mid-rebuild can
    * leave new centroids beside old codes, and
    * [[appendRebuildBaseline]] replays are unguarded —
    * [[writeBundle]] publishes all members atomically with a ledgered
    * manifest and is the ONLY production write path. This entry point
    * exists so the bundle store's equivalence checks (x188/x193, the
    * specs) can build the flat comparison index through the exact same
    * encode arithmetic; nothing in a deployment should call it, and the
    * explicit name makes a stale caller visible at review rather than
    * as a compile warning.
    */
  def writeRebuildBaseline(candidates: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], dir: String,
      nCentroids: Int = 16, trainIters: Int = 0, spill: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(spill >= 1,
      s"AnnIndex.writeRebuildBaseline: spill=$spill must be >= 1")
    val spark = candidates.sparkSession
    val centroids = trainCentroids(candidates, nCentroids, trainIters, idCol, vecCol)
    centroidsDf(spark, centroids)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    booksDf(spark, books)
      .write.mode("overwrite").parquet(s"$dir/books.parquet")
    encodeAssign(candidates, books, centroids, spill, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/codes.parquet")
  }

  /** The quantizer, trained (spherical k-means) or hash-order sampled —
    * the one step of every index build that decides the cells.
    */
  private def trainCentroids(candidates: DataFrame, nCentroids: Int,
      trainIters: Int, idCol: String, vecCol: String): Seq[(Int, Seq[Double])] =
    if (trainIters > 0)
      Similarity.kmeansCentroids(candidates, nCentroids, trainIters, idCol, vecCol)
        .toIndexedSeq.zipWithIndex.map { case (cv, i) => (i, cv) }
    else Similarity.sampleCentroids(candidates, nCentroids, idCol, vecCol)

  private def centroidsDf(spark: SparkSession,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    centroids.map { case (i, v) => (i, v) }.toDF("cell", "centroid")
      .repartition(1)
  }

  private def booksDf(spark: SparkSession,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): DataFrame = {
    import spark.implicits._
    books.indices.flatMap { j =>
      books(j).indices.map(c => (j, c, books(j)(c)))
    }.toDF("sub", "code", "centroid")
      .repartition(1)
  }

  /** (id, pq, cell) rows for a vector frame against a FROZEN quantizer +
    * codebooks — the one shared encode step of `write` and `append`, so
    * build-time and append-time assignment can never drift.
    */
  private def encodeAssign(vectors: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      centroids: Seq[(Int, Seq[Double])], spill: Int,
      idCol: String, vecCol: String): DataFrame = {
    val encoded = Embeddings.pqEncode(vectors, books, vecCol, as = "pq")
    val withCell =
      if (spill == 1) encoded.withColumn("cell",
        Similarity.nearestCentroid(asDouble(col(vecCol)), centroids))
      else encoded.withColumn("cell",
        explode(slice(graft.functions.Staging.pin(
          Similarity.centroidRanks(asDouble(col(vecCol)), centroids)), 1, spill)))
    withCell.select(col(idCol), col("pq"), col("cell"))
  }

  /** INCREMENTAL maintenance: append a vector batch to the stored index
    * WITHOUT retraining — the steady-state ingest path of a serving
    * corpus. The quantizer and codebooks are read back FROZEN (so every
    * existing code stays valid and serve-side cell planning is
    * unchanged); the batch is PQ-encoded and cell-assigned through the
    * exact same expressions as the original build (shared `encodeAssign`,
    * same `spill` the index was built with), and its rows land as new
    * files inside the existing cell directories (dynamic-partition
    * append — untouched cells gain no files). Cost is one narrow map
    * over the BATCH: nothing rescans or rewrites the existing corpus,
    * which is the whole point at 100 TB.
    *
    * File-count maintenance: many appends leave one small file per batch
    * in each touched cell directory;
    * `Catalog.compactPartition(spark, dir, "codes", Seq(("cell", c)))`
    * rewrites one cell in place (atomic swap) without touching the
    * quantizer, codebooks, or serve planning.
    *
    * REBUILD BASELINE, not a production path: unledgered — a replayed
    * batch double-appends, and duplicate nids then occupy multiple
    * top-k slots in the exact re-rank. [[appendBundle]] records the
    * batch id in the manifest atomically with the data and is the ONLY
    * production append. Kept (explicitly named, test-only) for flat
    * stores laid out by [[writeRebuildBaseline]].
    */
  def appendRebuildBaseline(spark: SparkSession, dir: String, batch: DataFrame,
      spill: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val centroids = readCentroids(spark, dir)
    val books = readBooks(spark, dir)
    encodeAssign(batch, books, centroids, spill, idCol, vecCol)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$dir/codes.parquet")
  }

  /** The quantizer, read back (bounded: nCentroids rows). */
  def readCentroids(spark: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    parseCentroids(spark.read.parquet(s"$dir/centroids.parquet"))

  /** The PQ codebooks, read back (bounded: m×k rows). */
  def readBooks(spark: SparkSession,
      dir: String): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    parseBooks(spark.read.parquet(s"$dir/books.parquet"))

  private def parseCentroids(df: DataFrame): Seq[(Int, Seq[Double])] =
    df.select(col("cell"), col("centroid")).orderBy(col("cell"))
      .collect()
      .toIndexedSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

  private def parseBooks(df: DataFrame): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rows = df.select(col("sub"), col("code"), col("centroid"))
      .orderBy(col("sub"), col("code"))
      .collect()
    rows.groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    }
  }

  /** Training-free serve from a stored index: probe cells planned on the
    * driver, codes read partition-pruned, ADC shortlist, exact re-rank
    * against the corpus's raw vectors. Returns (qid, nid, sim, rank) like
    * every kNN in the family — a persisted, materialized frame; the
    * caller owns its one unpersist (see [[graft.Lifecycle]]).
    *
    * `within` (one id column, any name) restricts the CANDIDATE set —
    * filtered vector search over the same stored index. The semi-join
    * lands on the cell-pruned decoded codes BEFORE ADC scoring, so a
    * selective filter shrinks the shortlist work too; the exact re-rank
    * only ever sees filtered candidates through the shortlist.
    */
  def knn(spark: SparkSession, dir: String, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int = 50, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      within: Option[DataFrame] = None,
      withinPairs: Option[DataFrame] = None,
      materialize: Boolean = true): DataFrame =
    serveCore(spark, readCentroids(spark, dir), readBooks(spark, dir),
      spark.read.parquet(s"$dir/codes.parquet"), corpus, queries, k,
      rerank, nProbe, idCol, vecCol, within, withinPairs, materialize)

  /** The one serve plan both the flat-directory index and the
    * bundle-backed index ([[knnBundle]]) run: probe cells planned on the
    * driver, `codesAll` pruned by the probe list (a partition filter —
    * only the probed cell directories are listed), ADC shortlist, exact
    * re-rank. The codes SOURCE is the only thing that differs between
    * the two stores, so their serves cannot drift.
    */
  private def serveCore(spark: SparkSession,
      centroids: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      codesAll: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, rerank: Int, nProbe: Int,
      idCol: String, vecCol: String,
      within: Option[DataFrame],
      withinPairs: Option[DataFrame] = None,
      materialize: Boolean = true): DataFrame = {
    require(rerank > k, s"AnnIndex.knn: rerank=$rerank must exceed k=$k")
    val probed = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(Similarity.dot(col("qvec"), col("qvec"))))
      .withColumn("cell", explode(slice(graft.functions.Staging.pin(
        Similarity.centroidRanks(col("qvec"), centroids)), 1, nProbe)))
    // the probe list is driver-planned (bounded by nCentroids): an IN on
    // the partition column makes the codes scan read ONLY those cells
    val probeCells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val pruned = codesAll
      .where(col("cell").isin(probeCells.map(Integer.valueOf).toIndexedSeq: _*))
    val kept = within.fold(pruned) { w =>
      val ids = w.select(col(w.columns.head).as("__within_id"))
      pruned.join(ids, pruned(idCol) === ids("__within_id"), "left_semi")
    }
    val decoded = kept
      .withColumn("cvec", asDouble(Embeddings.pqDecode(col("pq"), books)))
      .select(col(idCol).as("nid"), col("cell"), col("cvec"),
        sqrt(Similarity.dot(col("cvec"), col("cvec"))).as("cn"))
    // a spill-built index holds a vector in several cells: overlapping
    // probes then surface the same (qid, nid) more than once — collapse
    // before ranking (the duplicates carry identical sims)
    val scoredAll = decoded.join(probed, Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(Similarity.dot(col("qvec"), col("cvec"))
            / (col("cn") * col("qn"))).as("sim"))
      .dropDuplicates("qid", "nid")
    // per-QUERY eligibility ((qid, id) rows — a bulk serve's per-request
    // ACL): unlike the shared `within`, this cannot prune the codes scan
    // (a code allowed for one query and not another), so it semi-joins
    // the (qid, nid) scores before the rank window — semantics per qid
    // equal the single serve with that query's own allowed set
    val scored = withinPairs.fold(scoredAll) { wp =>
      val cs = wp.columns
      val pairs = wp.select(col(cs(0)).as("qid"), col(cs(1)).as("nid"))
      scoredAll.join(pairs, Seq("qid", "nid"), "left_semi")
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= rerank)
      .select(col("qid"), col("nid"))
    val exact = Similarity.rerankExact(shortlist, corpus, queries, k, idCol, vecCol)
    // `materialize = false` is the COMPOSED-serve shape (threeStage*):
    // the caller's own MMR stage collects the fused pool within the same
    // call — before anything can mutate the store — so the eager
    // persist+count here would be one extra action per serve for a frame
    // consumed exactly once. Direct/public serves keep the materialized
    // contract (answers reflect call-time store state under later
    // maintenance; caller owns the one unpersist — graft.Lifecycle).
    if (materialize) graft.Lifecycle.withMaterialized()(exact) else exact
  }

  // ------------- bundle-backed index: the manifest IS the ledger -------------

  /** Build the index ON the atomic bundle store
    * ([[graft.sources.Catalog.commitBundle]]) — the store-protocol
    * migration the flat [[writeRebuildBaseline]] lacks: centroids, codebooks and codes
    * publish in ONE staged-directory rename, so a crash mid-rebuild can
    * never leave new centroids beside old codes (codes encoded against
    * one codebook, decoded with another — wrong distances, no error).
    * The codes member keeps its cell partitioning (declared in the
    * manifest, so appends and compaction preserve the pruning layout),
    * and `spill` rides in a one-row `params` member so the append path
    * reads the build's own setting instead of trusting a caller to
    * repeat it. `seedBatchIds` records the creating batch(es) in the
    * manifest's ledger, closing the create-replay window.
    */
  def writeBundle(candidates: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], root: String,
      name: String, nCentroids: Int = 16, trainIters: Int = 0,
      spill: Int = 1, idCol: String = "vec_id", vecCol: String = "embedding",
      seedBatchIds: Seq[String] = Nil): Long = {
    require(spill >= 1, s"AnnIndex.writeBundle: spill=$spill must be >= 1")
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(candidates, nCentroids, trainIters, idCol, vecCol)
    Catalog.commitBundle(Seq(
        "centroids" -> centroidsDf(spark, centroids),
        "books" -> booksDf(spark, books),
        "params" -> Seq(spill).toDF("spill").repartition(1),
        "codes" -> encodeAssign(candidates, books, centroids, spill, idCol, vecCol)),
      root, name, seedBatchIds, partitionBy = Map("codes" -> Seq("cell")))
  }

  /** Blue/green REINDEX: retrain the quantizer on the current corpus
    * and republish centroids, codebooks, params and freshly-encoded
    * codes as ONE superseding version — the periodic maintenance a
    * drifting corpus needs (the frozen quantizer [[appendBundle]]
    * rightly never moves loses recall as the corpus's direction
    * clusters drift from the training sample). Three properties make
    * it safe under live traffic: (a) the batch LEDGER carries over
    * verbatim ([[writeBundle]] would reset it — a replayed historic
    * batch would re-ingest after the rebuild), (b) `supersedes` makes
    * a batch appended between this rebuild's corpus read and its
    * commit fail the reindex LOUDLY instead of silently vanishing from
    * the new snapshot ([[graft.sources.Catalog.commitBundle]]), and
    * (c) in-flight serves pinned at the old version keep answering it
    * until retention ([[knnBundle]] `version`). `corpus` must be the
    * store's current logical content — the caller's contract, same as
    * every rebuild baseline.
    */
  def reindexBundle(spark: SparkSession, root: String, name: String,
      corpus: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      nCentroids: Int = 16, trainIters: Int = 0, spill: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    import spark.implicits._
    val pv = Catalog.latestBundleVersion(spark, root, name)
      .getOrElse(sys.error(s"AnnIndex.reindexBundle: no committed " +
        s"versions for '$name' under $root"))
    val prior = Catalog.bundleManifest(spark, root, name, Some(pv))
    val centroids = trainCentroids(corpus, nCentroids, trainIters, idCol, vecCol)
    Catalog.commitBundle(Seq(
        "centroids" -> centroidsDf(spark, centroids),
        "books" -> booksDf(spark, books),
        "params" -> Seq(spill).toDF("spill").repartition(1),
        "codes" -> encodeAssign(corpus, books, centroids, spill, idCol, vecCol)),
      root, name, prior.batches, partitionBy = Map("codes" -> Seq("cell")),
      supersedes = Some(pv))
  }

  /** LEDGERED incremental append — [[appendRebuildBaseline]] with the at-least-once
    * residual closed: the batch's code rows land as a new file set via
    * [[graft.sources.Catalog.appendBundle]] with the batch id IN the
    * manifest, so a replayed append returns false with the index
    * untouched (the flat append double-appends, and duplicate nid
    * candidates then occupy multiple top-k slots in the exact re-rank,
    * silently displacing real neighbors). The quantizer, codebooks AND
    * the build's `spill` are read back frozen from the bundle itself —
    * batch assignment runs the exact build arithmetic by construction.
    */
  def appendBundle(spark: SparkSession, root: String, name: String,
      batch: DataFrame, batchId: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      version: Option[Long] = None): Boolean = {
    // ONE resolved version for all three encode inputs — resolving
    // latest per member would let a racing retrain pair one version's
    // centroids with another's codebooks, assigning the batch with
    // arithmetic no committed index ever had. The claim then re-checks
    // (atomically, via `pinned`) that those members are STILL the
    // pinned version's at publish: codes encoded against a quantizer a
    // racing rebuild superseded must fail loudly, never commit.
    val v = version.orElse(Catalog.latestBundleVersion(spark, root, name))
      .getOrElse(sys.error(s"AnnIndex.appendBundle: no committed " +
        s"versions for '$name' under $root"))
    val centroids = parseCentroids(
      Catalog.readBundleTable(spark, root, name, "centroids", Some(v)))
    val books = parseBooks(
      Catalog.readBundleTable(spark, root, name, "books", Some(v)))
    val spill = Catalog.readBundleTable(spark, root, name, "params", Some(v))
      .select(col("spill")).collect()(0).getInt(0)
    Catalog.appendBundle(
      Seq("codes" -> encodeAssign(batch, books, centroids, spill, idCol, vecCol)),
      root, name, batchId,
      pinned = Some((v, Seq("centroids", "books", "params"))))
  }

  /** Training-free serve off the BUNDLE-backed index — the same plan as
    * [[knn]] (shared [[serveCore]]), with centroids/books/codes ALL
    * resolved through ONE committed manifest version: `version` is
    * resolved (to latest when `None`) exactly once at entry and
    * threaded through every member read, so a commit landing between
    * the reads can never pair one version's centroids with another's
    * codes (wrong distances, no error) — the serve answers entirely
    * from the pinned version, which stays readable until
    * [[graft.sources.Catalog.pruneBundleVersions]] retention. Pass
    * `Some(v)` for explicit time-travel serving.
    */
  def knnBundle(spark: SparkSession, root: String, name: String,
      corpus: DataFrame, queries: DataFrame, k: Int, rerank: Int = 50,
      nProbe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      within: Option[DataFrame] = None,
      version: Option[Long] = None,
      withinPairs: Option[DataFrame] = None,
      materialize: Boolean = true): DataFrame = {
    val v = version.orElse(Catalog.latestBundleVersion(spark, root, name))
      .getOrElse(sys.error(s"AnnIndex.knnBundle: no committed versions " +
        s"for '$name' under $root"))
    serveCore(spark,
      parseCentroids(Catalog.readBundleTable(spark, root, name, "centroids", Some(v))),
      parseBooks(Catalog.readBundleTable(spark, root, name, "books", Some(v))),
      Catalog.readBundleTable(spark, root, name, "codes", Some(v)),
      corpus, queries, k, rerank, nProbe, idCol, vecCol, within,
      withinPairs, materialize)
  }

  /** TAKEDOWN: remove a vector id set from the bundle-backed index in
    * ONE atomic version — the ANN twin of
    * [[TextIndex.retractBundle]]: the codes member loses the removed
    * ids by a broadcast anti-join (one pass, cell layout preserved by
    * the manifest), while the quantizer, codebooks and params carry
    * forward BY REFERENCE (never read or rewritten — removing vectors
    * cannot move a frozen quantizer, and every surviving code stays
    * valid). Ledger preserved; serves after the flip return exactly
    * what an index rebuilt without the ids returns (AnnIndexSpec pins
    * the exhaustive serve against brute force over the remaining
    * corpus); rows leave disk at retention. `ids`: one id column.
    */
  def retractBundle(spark: SparkSession, root: String, name: String,
      ids: DataFrame, idCol: String = "vec_id"): Long = {
    val rm = broadcast(ids.select(col(ids.columns.head).as("__rm_id")))
    Catalog.rewriteBundleMembers(spark, root, name, Map(
      "codes" -> ((c: DataFrame) =>
        c.join(rm, c(idCol) === rm("__rm_id"), "left_anti"))))
  }
}
