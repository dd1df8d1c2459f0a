package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Catalog

import graft.functions.Num.roundz

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — exact, O(|queries| × n), right
  * whenever the query set broadcasts. Scale path: sign-random-projection
  * LSH buckets (an IVF-style candidate cut) — candidates share a bucket,
  * then exact re-rank; recall is tunable via planes/probes.
  *
  * Vector math runs through the native codegen'd `vec_dot` expression when
  * the session enables `graft.GraftExtensions` (interpreted higher-order
  * fallback otherwise) — no UDFs, no driver-side loops.
  */
object Similarity {

  /** Dot product of two array columns (double) — the native codegen'd
    * expression (graft.functions.VectorExpressions.DotProduct), resolved
    * through the function registry so sessions must enable
    * `spark.sql.extensions=graft.GraftExtensions` (Engine/Verify/Bench do).
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Interpreted reference implementation of `dot` from built-in
    * higher-order functions — semantics oracle for the native expression
    * (see SimilaritySpec), and the fallback for sessions without the
    * extension. ~10× slower per pair: HOFs evaluate interpreted.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Session-aware dot: native expression when the extension is registered
    * in the session owning `df`, interpreted fallback otherwise — so the
    * operators below work (slower) in vanilla sessions too.
    */
  private def dotFor(df: DataFrame): (Column, Column) => Column =
    dotIn(df.sparkSession)

  private def dotIn(spark: org.apache.spark.sql.SparkSession): (Column, Column) => Column =
    if (spark.catalog.functionExists("vec_dot")) dot else dotHof

  /** Session-aware dot for the ACTIVE session: native when GraftExtensions
    * is registered there, interpreted fallback otherwise.
    */
  private def activeDot: (Column, Column) => Column =
    org.apache.spark.sql.SparkSession.getActiveSession.map(dotIn)
      .getOrElse(dotHof)

  /** L2 norm — native vec_dot when the active session has GraftExtensions,
    * interpreted fallback otherwise.
    */
  def norm(a: Column): Column = norm(a, activeDot)

  /** L2 norm with a caller-chosen dot (pass `dotHof`, or the result of
    * `dotFor`, for sessions without the extension).
    */
  def norm(a: Column, dotFn: (Column, Column) => Column): Column =
    sqrt(dotFn(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. Native vec_dot
    * when the active session has GraftExtensions, interpreted fallback
    * otherwise.
    */
  def cosine(a: Column, b: Column): Column = cosine(a, b, activeDot)

  /** Cosine with a caller-chosen dot, for extension-less sessions. */
  def cosine(a: Column, b: Column, dotFn: (Column, Column) => Column): Column = {
    val d = norm(a, dotFn) * norm(b, dotFn)
    when(d === 0, lit(0.0d)).otherwise(dotFn(a, b) / d)
  }

  /** Session-aware cosine: resolves native-vs-interpreted dot from the
    * session owning `df`, like the kNN operators do.
    */
  def cosineFor(df: DataFrame)(a: Column, b: Column): Column =
    cosine(a, b, dotFor(df))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` must be broadcast-small (it is hint-broadcast). The join is
    * a broadcast nested loop — every candidate partition streams once, no
    * shuffle of the corpus; the only shuffle is the per-query top-k
    * (rank window over |queries|×n scored rows). Deterministic tie-break
    * on neighbor id.
    */
  def bruteForceKnn(candidates: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are per-vector, computed once here — computing them inside the
    // pair-scoring expression would redo each one per candidate pair
    val d = dotFor(candidates)
    val c = candidates.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(d(col("cvec"), col("cvec"))))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(d(col("qvec"), col("qvec"))))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(d(col("qvec"), col("cvec")) / (col("cn") * col("qn"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Hybrid retrieval — reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher, SIGIR'09, public) of an exact LEXICAL ranking (3-gram
    * Jaccard to the query document) and an exact VECTOR ranking (cosine
    * to the query embedding): `rrf = Σ 1/(rrfK + rank_side)` over the
    * sides that retrieved the doc within their top `poolK`, re-ranked
    * and cut to `k`. The fused exact baseline for the engine's two
    * serving stacks — production fuses the SAME ranks served off the
    * stored text index (BM25) and ANN index; the fusion arithmetic and
    * tie-breaks are identical, only the rank providers change.
    *
    * Scale posture is x8's: queries ≪ corpus, the query side broadcasts,
    * each corpus side streams once; ranks are per-query windows (bounded
    * by the retrieval pools). Both ranks break ties on ascending id, so
    * the fusion is fully deterministic and SQL-replayable.
    */
  def hybridRrf(docs: DataFrame, queryDocs: DataFrame, vecs: DataFrame,
      queryVecs: DataFrame, k: Int, poolK: Int = 50, rrfK: Int = 60,
      shingleSize: Int = 3, docIdCol: String = "doc_id",
      textCol: String = "text", vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && poolK >= k && rrfK >= 1,
      s"hybridRrf: k=$k poolK=$poolK rrfK=$rrfK")
    val cs = Dedup.shingled(docs, docIdCol, textCol, shingleSize)
      .select(col(docIdCol).as("nid"), col("sh").as("csh"))
    val qs = Dedup.shingled(queryDocs, docIdCol, textCol, shingleSize)
      .select(col(docIdCol).as("qid"), col("sh").as("qsh"))
    val lw = Window.partitionBy(col("qid")).orderBy(col("jac").desc, col("nid"))
    val lex = cs.crossJoin(broadcast(qs))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Dedup.jaccard(col("qsh"), col("csh")).as("jac"))
      .withColumn("lrank", row_number().over(lw))
      .where(col("lrank") <= poolK)
      .select(col("qid"), col("nid"), col("lrank"))
    val vec = bruteForceKnn(vecs, queryVecs, poolK, vecIdCol, vecCol)
      .select(col("qid"), col("nid"), col("rank").as("vrank"))
    rrfFuseBatch(lex, vec, k, rrfK)
  }

  /** Per-query reciprocal-rank fusion — [[rrfFuse]] generalized to N
    * queries in one plan: `lex` (qid, nid, lrank) and `vec` (qid, nid,
    * vrank) full-outer-join on (qid, nid), each side contributes
    * `1/(rrfK + rank)` when present, top-k per qid. The window is
    * qid-partitioned over at most 2·poolK rows per query — never
    * corpus-sized, and never the single-partition global window the
    * one-query [[rrfFuse]] is allowed. One implementation serves
    * [[hybridRrf]] (the exact baseline) and the batched stored serve,
    * so fusion arithmetic cannot drift between them.
    */
  def rrfFuseBatch(lex: DataFrame, vec: DataFrame, k: Int,
      rrfK: Int = 60): DataFrame = {
    require(k >= 1 && rrfK >= 1, s"rrfFuseBatch: k=$k rrfK=$rrfK")
    val fw = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("nid"))
    lex.join(vec, Seq("qid", "nid"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vrank")), lit(0.0)))
      .withColumn("rank", row_number().over(fw))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rrf"), col("rank"))
  }

  /** Reciprocal-rank fusion of two single-query rank lists — the fusion
    * arithmetic of [[hybridRrf]] factored out so the exact baseline
    * (x161) and the stored-index serve (x165) share one implementation:
    * `lex` (nid, lrank) and `vec` (nid, vrank) full-outer-join on the
    * candidate id, each side contributes `1/(rrfK + rank)` when present,
    * ties break on ascending id. The global window is safe: the input is
    * at most two retrieval pools (≤ 2·poolK rows), never corpus-sized.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1 && rrfK >= 1, s"rrfFuse: k=$k rrfK=$rrfK")
    val fw = Window.orderBy(col("rrf").desc, col("nid"))
    lex.join(vec, Seq("nid"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vrank")), lit(0.0)))
      .withColumn("rank", row_number().over(fw))
      .where(col("rank") <= k)
      .select(col("nid"), col("rrf"), col("rank"))
  }

  /** Hybrid retrieval served off both STORED indexes — the production
    * serving path [[hybridRrf]] is the exact baseline for: one user
    * query arrives as a term list plus its embedding, the lexical ranks
    * come from BM25 over the stored text index
    * ([[graft.operators.TextIndex.bm25Search]] — postings scan pruned to
    * the query terms' shards), the vector ranks from the stored ANN
    * index ([[graft.operators.AnnIndex.knn]] — codes scan pruned to the
    * probed cells), and [[rrfFuse]] fuses the two pools. Nothing here
    * touches corpus text or trains anything: both expensive passes
    * happened once at index-build time, and the serve reads two pruned
    * stores plus the bounded meta/quantizer tables. Single-query
    * contract: `queryVec` is one vector (its id only excludes itself
    * from the vector pool).
    *
    * `within` (one id column, any name) is the production metadata
    * filter, applied as a candidate restriction on BOTH retrieval sides
    * before their top-k (global BM25 statistics, per
    * [[graft.operators.TextIndex.bm25Search]]); the fused result can
    * then only contain allowed ids.
    */
  def hybridStoredServe(spark: org.apache.spark.sql.SparkSession,
      textIdx: String, annIdx: String, vecs: DataFrame,
      queryTerms: Seq[String], queryVec: DataFrame, k: Int,
      poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None): DataFrame = {
    require(poolK >= k, s"hybridStoredServe: poolK=$poolK < k=$k")
    val lex = TextIndex.bm25Search(spark, textIdx, queryTerms, k = poolK,
        within = within)
      .select(col("doc_id").as("nid"), col("rank").cast("int").as("lrank"))
    val vec = AnnIndex.knn(spark, annIdx, vecs, queryVec, k = poolK,
        rerank = rerank, nProbe = nProbe, within = within)
      .select(col("nid"), col("rank").as("vrank"))
    rrfFuse(lex, vec, k, rrfK)
  }

  /** [[hybridStoredServe]] with both retrieval stages on the atomic
    * BUNDLE stores — same cores, each index resolved at ONE committed
    * manifest version (resolved once here, threaded through every
    * member read; see [[threeStageServeBundle]] for the pinning
    * contract).
    */
  def hybridStoredServeBundle(spark: org.apache.spark.sql.SparkSession,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, queryTerms: Seq[String], queryVec: DataFrame, k: Int,
      poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      textVersion: Option[Long] = None,
      annVersion: Option[Long] = None): DataFrame = {
    require(poolK >= k, s"hybridStoredServeBundle: poolK=$poolK < k=$k")
    val tv = textVersion
      .orElse(Catalog.latestBundleVersion(spark, textRoot, textName))
      .getOrElse(sys.error(s"hybridStoredServeBundle: no committed " +
        s"versions for text index '$textName' under $textRoot"))
    val av = annVersion
      .orElse(Catalog.latestBundleVersion(spark, annRoot, annName))
      .getOrElse(sys.error(s"hybridStoredServeBundle: no committed " +
        s"versions for ANN index '$annName' under $annRoot"))
    val lex = TextIndex.bm25SearchBundle(spark, textRoot, textName,
        queryTerms, k = poolK, within = within, version = Some(tv))
      .select(col("doc_id").as("nid"), col("rank").cast("int").as("lrank"))
    val vec = AnnIndex.knnBundle(spark, annRoot, annName, vecs, queryVec,
        k = poolK, rerank = rerank, nProbe = nProbe, within = within,
        version = Some(av))
      .select(col("nid"), col("rank").as("vrank"))
    rrfFuse(lex, vec, k, rrfK)
  }

  /** Maximal-marginal-relevance diversified re-rank (Carbonell &
    * Goldstein, SIGIR'98, public) of one query's candidate shortlist —
    * the serving stack's third stage after retrieval (x8/x95) and fusion
    * (x161/x165): greedily select k of the top-`poolK` candidates, each
    * step taking the argmax of `relevance − max similarity to an
    * already-selected result`. λ is fixed at 0.5, whose common factor
    * cancels in the argmax, so the step score is the INTEGER
    * `qsim4 − max psim4` over cosines rounded and scaled to ×10⁴ longs —
    * fully engine-replayable, ties on ascending id (rank-1 scores pure
    * relevance: no selected set yet).
    *
    * Scale posture: the distributed work is the shortlist retrieval
    * (bruteForceKnn — swap in the stored-index serve at scale) and the
    * poolK² pairwise cosines; the greedy itself runs driver-side over
    * the COLLECTED pool, bounded by construction at poolK(≤256)² rows of
    * (id, id, long) — the query's own shortlist; corpus size never
    * enters. Output: (rank, nid, mmr4) — mmr4 the integer score at
    * selection time.
    */
  def mmrRerank(vecs: DataFrame, queryVec: DataFrame, k: Int,
      poolK: Int = 30): DataFrame = {
    require(k >= 1 && poolK >= k && poolK <= 256,
      s"mmrRerank: k=$k poolK=$poolK out of range")
    mmrRerankPool(vecs, queryVec,
      bruteForceKnn(vecs, queryVec, poolK).select(col("nid")), k)
  }

  /** The MMR core over an EXPLICIT candidate pool — the shape the
    * composed serving stack needs: `pool` (one `nid` column, ≤ 256
    * candidates — a retrieval shortlist, never the corpus; every id must
    * resolve to a `vecs` row, enforced loudly — a silent drop would
    * return fewer than k with no signal) arrives from
    * whatever retrieval stage ran before ([[bruteForceKnn]] for the
    * exact baseline, [[hybridStoredServe]]'s fused list for the
    * production path in [[threeStageServe]]), relevance is recomputed
    * here as the ×10⁴-rounded integer cosine of each pool member to the
    * query (bit-identical to [[bruteForceKnn]]'s scoring expression, so
    * pool-from-knn replays exactly), and the λ=0.5 greedy runs
    * driver-side over the collected pool — bounded by construction at
    * pool² (id, id, long) rows; corpus size never enters.
    */
  def mmrRerankPool(vecs: DataFrame, queryVec: DataFrame, pool: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"mmrRerankPool: k=$k")
    val spark = vecs.sparkSession
    val d = dotFor(vecs)
    val ids = pool.select(col("nid")).distinct().persist()
    val sub = vecs.join(broadcast(ids), vecs(idCol) === ids("nid"), "left_semi")
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", sqrt(d(col("v"), col("v"))))
      .persist()
    try {
      val nSub = sub.count()
      // every pool id must resolve to a vector: a doc-id/vec-id space
      // mismatch between the retrieval stage and the vector table would
      // otherwise silently shrink the result below k with no signal
      val nPool = ids.count()
      require(nSub == nPool, s"mmrRerankPool: ${nPool - nSub} of $nPool " +
        s"pool ids have no '$idCol' row in the vector table — id-space " +
        "mismatch between the retrieval stage and the vectors")
      require(nSub <= 256,
        "mmrRerankPool: pool exceeds the 256-candidate driver-greedy bound")
      val q = queryVec.select(asDouble(col(vecCol)).as("qv"))
        .withColumn("qn", sqrt(d(col("qv"), col("qv"))))
      val qsims = sub.crossJoin(broadcast(q))
        .select(col("id").as("nid"),
          round(when(col("n") * col("qn") === 0, lit(0.0d))
            .otherwise(d(col("qv"), col("v")) / (col("n") * col("qn")))
            * lit(1e4), 0).cast("long").as("qsim4"))
      val pa = sub.select(col("id").as("na"), col("v").as("va"), col("n").as("nna"))
      val pb = sub.select(col("id").as("nb"), col("v").as("vb"), col("n").as("nnb"))
      val pairSims = pa.crossJoin(broadcast(pb))
        .where(col("na") =!= col("nb"))
        .select(col("na"), col("nb"),
          round(when(col("nna") * col("nnb") === 0, lit(0.0d))
            .otherwise(d(col("va"), col("vb")) / (col("nna") * col("nnb")))
            * lit(1e4), 0).cast("long").as("psim4"))
      // bounded driver greedy: pool candidates, pool² pair rows — both
      // collected in ONE action (tagged union; `sub` is already
      // cache-materialized by the resolution count, so every branch of
      // the union job reads cache); a second collect was fixed overhead
      val merged = qsims
        .select(lit(0).as("__t"), col("nid").as("__a"), lit(0L).as("__b"),
          col("qsim4").as("__v"))
        .unionByName(pairSims
          .select(lit(1).as("__t"), col("na").as("__a"), col("nb").as("__b"),
            col("psim4").as("__v")))
        .collect()
      val cand = merged.filter(_.getInt(0) == 0)
        .map(r => r.getLong(1) -> r.getLong(3)).toMap
      val psim = merged.filter(_.getInt(0) == 1)
        .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      import spark.implicits._
      mmrGreedy(cand, psim, k).toDF("rank", "nid", "mmr4")
    } finally { sub.unpersist(); ids.unpersist(); () }
  }

  /** The λ=0.5 integer MMR greedy over ONE query's collected pool — the
    * single driver-side step both [[mmrRerankPool]] and the batched
    * [[mmrRerankPoolBatch]] run, so single and batched serves select
    * identically by construction. Ties break (score desc, id asc);
    * rank 1 is pure relevance.
    */
  private def mmrGreedy(cand: Map[Long, Long],
      psim: Map[(Long, Long), Long], k: Int): Seq[(Int, Long, Long)] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val remaining = scala.collection.mutable.TreeSet.empty[Long] ++ cand.keys
    for (rank <- 1 to math.min(k, cand.size)) {
      val best = remaining.map { nid =>
        val penalty = if (selected.isEmpty) 0L
          else selected.map { case (_, s, _) => psim((nid, s)) }.max
        (nid, cand(nid) - (if (selected.isEmpty) 0L else penalty))
      }.minBy { case (nid, s) => (-s, nid) } // score desc, id asc
      selected += ((rank, best._1, best._2))
      remaining -= best._1
    }
    selected.toSeq
  }

  /** Hard ceiling on the pair rows the batched greedy may collect:
    * Σ_q pool_q² must fit the driver comfortably — 2²⁰ (id, id, long)
    * rows ≈ 24 MB. At fuseK=30 that admits ~1100 queries per plan; at
    * the 256-candidate single-query bound, 16. Callers batching more
    * split the query set — an explicit cap, not a silent truncation.
    */
  val MaxBatchGreedyPairRows: Long = 1L << 20

  /** [[mmrRerankPool]] generalized to N queries in ONE plan: `pool` is
    * (qid, nid) per-query shortlists, `queryVecs` the matching query
    * vectors, and the greedy runs per qid over the collected pools —
    * each query's selection is EXACTLY what [[mmrRerankPool]] would
    * pick alone (shared [[mmrGreedy]], same ×10⁴ integer cosines), so
    * batching is a throughput decision, never a semantics one. The
    * distributed work (pool-vector resolution, per-qid relevance and
    * pairwise cosines) is one plan over Σ pool_q rows and Σ pool_q²
    * pair rows, capped by [[MaxBatchGreedyPairRows]] and the per-query
    * 256-candidate bound before anything is collected. Every (qid,
    * nid) must resolve to a vector row — loud failure, same contract
    * as the single-query pool. Returns (qid, rank, nid, mmr4).
    */
  def mmrRerankPoolBatch(vecs: DataFrame, queryVecs: DataFrame,
      pool: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"mmrRerankPoolBatch: k=$k")
    val spark = vecs.sparkSession
    val d = dotFor(vecs)
    val ids = pool.select(col("qid"), col("nid")).distinct().persist()
    try {
      val sizes = ids.groupBy(col("qid")).agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(sizes.nonEmpty, "mmrRerankPoolBatch: empty pool")
      require(sizes.values.forall(_ <= 256),
        s"mmrRerankPoolBatch: a per-query pool exceeds the 256-candidate " +
          s"driver-greedy bound (max ${sizes.values.max})")
      val pairRows = sizes.values.map(n => n * n).sum
      require(pairRows <= MaxBatchGreedyPairRows,
        s"mmrRerankPoolBatch: ${sizes.size} pools collect $pairRows pair " +
          s"rows > $MaxBatchGreedyPairRows — split the query batch")
      val nids = ids.select(col("nid")).distinct()
      val sub = vecs
        .join(broadcast(nids), vecs(idCol) === nids("nid"), "left_semi")
        .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
        .withColumn("n", sqrt(d(col("v"), col("v"))))
      val poolVecs = ids.join(broadcast(sub), ids("nid") === sub("id"))
        .select(col("qid"), col("nid"), col("v"), col("n"))
        .persist()
      try {
        val nResolved = poolVecs.count()
        val nPool = sizes.values.sum
        require(nResolved == nPool,
          s"mmrRerankPoolBatch: ${nPool - nResolved} of $nPool pool ids " +
            s"have no '$idCol' row in the vector table — id-space mismatch " +
            "between the retrieval stage and the vectors")
        val q = queryVecs
          .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
          .withColumn("qn", sqrt(d(col("qv"), col("qv"))))
        val qsims = poolVecs.join(broadcast(q), Seq("qid"))
          .select(col("qid"), col("nid"),
            round(when(col("n") * col("qn") === 0, lit(0.0d))
              .otherwise(d(col("qv"), col("v")) / (col("n") * col("qn")))
              * lit(1e4), 0).cast("long").as("qsim4"))
        val pa = poolVecs.select(col("qid"), col("nid").as("na"),
          col("v").as("va"), col("n").as("nna"))
        val pb = poolVecs.select(col("qid"), col("nid").as("nb"),
          col("v").as("vb"), col("n").as("nnb"))
        val pairSims = pa.join(pb, Seq("qid"))
          .where(col("na") =!= col("nb"))
          .select(col("qid"), col("na"), col("nb"),
            round(when(col("nna") * col("nnb") === 0, lit(0.0d))
              .otherwise(d(col("va"), col("vb")) / (col("nna") * col("nnb")))
              * lit(1e4), 0).cast("long").as("psim4"))
        // ONE collect for both bounded sides (tagged union): the
        // relevance rows and the pair rows are each capped above, and a
        // second collect action was pure fixed overhead — poolVecs is
        // already cache-materialized (the resolution count), so the
        // union job reads cache on every branch
        val merged = qsims
          .select(lit(0).as("__t"), col("qid"), col("nid").as("__a"),
            lit(0L).as("__b"), col("qsim4").as("__v"))
          .unionByName(pairSims
            .select(lit(1).as("__t"), col("qid"), col("na").as("__a"),
              col("nb").as("__b"), col("psim4").as("__v")))
          .collect()
        val candByQ = merged.filter(_.getInt(0) == 0)
          .groupBy(_.getLong(1))
          .map { case (qid, rs) =>
            qid -> rs.map(r => r.getLong(2) -> r.getLong(4)).toMap }
        // a qid whose pool has no row in queryVecs vanishes in the
        // inner join above — the pool-resolution check can't see it, so
        // without this the batch would silently return ZERO rows for
        // that query; same loud-failure contract as the pool check
        require(candByQ.keySet == sizes.keySet,
          s"mmrRerankPoolBatch: qids ${sizes.keySet -- candByQ.keySet} " +
            s"have a pool but no '$idCol' row in the query-vector table " +
            "— qid mismatch between the retrieval stage and queryVecs")
        val psimByQ = merged.filter(_.getInt(0) == 1)
          .groupBy(_.getLong(1))
          .map { case (qid, rs) =>
            qid -> rs.map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap }
        val rows = candByQ.keys.toSeq.sorted.flatMap { qid =>
          mmrGreedy(candByQ(qid), psimByQ.getOrElse(qid, Map.empty), k)
            .map { case (rank, nid, mmr4) => (qid, rank, nid, mmr4) }
        }
        import spark.implicits._
        rows.toDF("qid", "rank", "nid", "mmr4")
      } finally { poolVecs.unpersist(); () }
    } finally { ids.unpersist(); () }
  }

  /** [[threeStageServe]] generalized to N queries in ONE plan — the
    * offline-eval / bulk-serving shape: each query arrives as (qid,
    * terms) plus its vector row, batched BM25 prunes the postings scan
    * ONCE to the union of the queries' term shards
    * ([[TextIndex.bm25SearchBatch]]), the stored ANN serve already
    * carries qid natively ([[AnnIndex.knn]]), fusion is per-qid
    * ([[rrfFuseBatch]]) and the greedy runs per qid over the collected
    * fused pools ([[mmrRerankPoolBatch]] — bounded at Σ fuseK² pair
    * rows with an explicit cap). Per-query results are EXACTLY the
    * single-query [[threeStageServe]]'s (shared cores end to end).
    * Returns (qid, rank, nid, mmr4).
    *
    * Filtering: `within` is one allowed-id set shared by every query;
    * `withinPairs` is PER-QUERY eligibility as (qid, id) rows — the
    * per-request ACL shape of a bulk serving tier (both may be set; a
    * candidate must pass both). Per-qid semantics equal the single
    * serve with that query's own allowed set (SimilaritySpec pins it).
    */
  def threeStageServeBatch(spark: org.apache.spark.sql.SparkSession,
      textIdx: String, annIdx: String, vecs: DataFrame,
      queryTerms: Seq[(Long, Seq[String])], queryVecs: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      withinPairs: Option[DataFrame] = None): DataFrame = {
    require(fuseK >= k && fuseK <= 256,
      s"threeStageServeBatch: fuseK=$fuseK out of range for k=$k")
    val lex = TextIndex.bm25SearchBatch(spark, textIdx, queryTerms,
        k = poolK, within = within, withinPairs = withinPairs)
      .select(col("qid"), col("doc_id").as("nid"),
        col("rank").cast("int").as("lrank"))
    // materialize = false: the MMR stage below collects the fused pool
    // within this same call, so the ANN serve's eager persist+count
    // would be one extra action for a frame consumed exactly once
    val vec = AnnIndex.knn(spark, annIdx, vecs, queryVecs, k = poolK,
        rerank = rerank, nProbe = nProbe, within = within,
        withinPairs = withinPairs, materialize = false)
      .select(col("qid"), col("nid"), col("rank").as("vrank"))
    val fused = rrfFuseBatch(lex, vec, fuseK, rrfK)
    mmrRerankPoolBatch(vecs, queryVecs,
      fused.select(col("qid"), col("nid")), k)
  }

  /** [[threeStageServeBatch]] with both retrieval stages on the atomic
    * BUNDLE stores — shared batch cores end to end
    * ([[graft.operators.TextIndex.bm25SearchBatchBundle]],
    * [[graft.operators.AnnIndex.knnBundle]] — qid rides natively,
    * [[rrfFuseBatch]], [[mmrRerankPoolBatch]]), each index resolved at
    * ONE committed manifest version (see [[threeStageServeBundle]] for
    * the pinning contract). Per-query results are EXACTLY the
    * single-query [[threeStageServeBundle]]'s.
    */
  def threeStageServeBatchBundle(spark: org.apache.spark.sql.SparkSession,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, queryTerms: Seq[(Long, Seq[String])],
      queryVecs: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      textVersion: Option[Long] = None,
      annVersion: Option[Long] = None,
      withinPairs: Option[DataFrame] = None): DataFrame = {
    require(fuseK >= k && fuseK <= 256,
      s"threeStageServeBatchBundle: fuseK=$fuseK out of range for k=$k")
    val tv = textVersion
      .orElse(Catalog.latestBundleVersion(spark, textRoot, textName))
      .getOrElse(sys.error(s"threeStageServeBatchBundle: no committed " +
        s"versions for text index '$textName' under $textRoot"))
    val av = annVersion
      .orElse(Catalog.latestBundleVersion(spark, annRoot, annName))
      .getOrElse(sys.error(s"threeStageServeBatchBundle: no committed " +
        s"versions for ANN index '$annName' under $annRoot"))
    val lex = TextIndex.bm25SearchBatchBundle(spark, textRoot, textName,
        queryTerms, k = poolK, within = within, version = Some(tv),
        withinPairs = withinPairs)
      .select(col("qid"), col("doc_id").as("nid"),
        col("rank").cast("int").as("lrank"))
    // materialize = false: the MMR stage below collects the fused pool
    // within this same call (before any maintenance can land), so the
    // ANN serve's eager persist+count would be one extra action
    val vec = AnnIndex.knnBundle(spark, annRoot, annName, vecs, queryVecs,
        k = poolK, rerank = rerank, nProbe = nProbe, within = within,
        version = Some(av), withinPairs = withinPairs, materialize = false)
      .select(col("qid"), col("nid"), col("rank").as("vrank"))
    val fused = rrfFuseBatch(lex, vec, fuseK, rrfK)
    mmrRerankPoolBatch(vecs, queryVecs,
      fused.select(col("qid"), col("nid")), k)
  }

  /** The COMPOSED three-stage serving stack — the query a production
    * search deployment actually runs, as one operator: (1) retrieval
    * off both STORED indexes (BM25 postings pruned to the query terms'
    * shards, ANN codes pruned to the probed cells), (2) reciprocal-rank
    * fusion of the two pools ([[rrfFuse]] — the same arithmetic as the
    * exact baseline), (3) maximal-marginal-relevance diversification of
    * the fused shortlist ([[mmrRerankPool]] — the greedy bounded at
    * `fuseK`² driver-side rows). Nothing in the composition touches
    * corpus text or trains: both expensive passes happened once at
    * index build, every serve-time scan is directory-pruned, and the
    * only corpus-sized frame (`vecs`) is read solely to fetch the
    * shortlist's own vectors through a broadcast semi-join.
    *
    * ALIGNMENT CONTRACT: the text index must index a subset of the
    * embedded corpus (build it over the docs that have vector rows) —
    * the MMR stage needs every fused candidate's vector, and a fused
    * id with no `vecs` row fails loudly ([[mmrRerankPool]]'s
    * resolution check) rather than silently shrinking the pool below
    * fuseK. Alignment is a BUILD-time property (one ingest-side
    * semi-join), deliberately not re-checked with a serve-time join
    * against the corpus-sized vector id set.
    */
  def threeStageServe(spark: org.apache.spark.sql.SparkSession,
      textIdx: String, annIdx: String, vecs: DataFrame,
      queryTerms: Seq[String], queryVec: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None): DataFrame = {
    require(fuseK >= k && fuseK <= 256,
      s"threeStageServe: fuseK=$fuseK out of range for k=$k")
    val fused = hybridStoredServe(spark, textIdx, annIdx, vecs, queryTerms,
      queryVec, k = fuseK, poolK = poolK, rrfK = rrfK, rerank = rerank,
      nProbe = nProbe, within = within)
    // the MMR pool is the fused shortlist, which is already filtered
    // when `within` is set — the greedy never reintroduces candidates
    mmrRerankPool(vecs, queryVec, fused.select(col("nid")), k)
  }

  /** [[threeStageServe]] with BOTH retrieval stages resolved through
    * atomic bundle stores ([[TextIndex.bm25SearchBundle]] +
    * [[AnnIndex.knnBundle]]) instead of flat directories — the serve a
    * production deployment runs once its indexes ride the ledgered
    * store protocol: every scan sees one committed manifest version of
    * each index (never a half-rebuilt one), and the plan is otherwise
    * identical (shared BM25/ADC cores, same [[rrfFuse]] arithmetic,
    * same [[mmrRerankPool]] greedy), so flat and bundle serves cannot
    * drift.
    *
    * VERSION PINNING: each index's version resolves ONCE here (to
    * latest when not passed) and threads through every member read of
    * its serve — a retrain, append, compaction or takedown committing
    * WHILE this serve runs cannot tear the answer across versions; the
    * serve returns exactly one committed version's result per index
    * (SimilaritySpec pins serving under concurrent maintenance). Pass
    * `textVersion`/`annVersion` for explicit time-travel serving.
    */
  def threeStageServeBundle(spark: org.apache.spark.sql.SparkSession,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, queryTerms: Seq[String], queryVec: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      textVersion: Option[Long] = None,
      annVersion: Option[Long] = None): DataFrame = {
    require(fuseK >= k && fuseK <= 256,
      s"threeStageServeBundle: fuseK=$fuseK out of range for k=$k")
    val tv = textVersion
      .orElse(Catalog.latestBundleVersion(spark, textRoot, textName))
      .getOrElse(sys.error(s"threeStageServeBundle: no committed " +
        s"versions for text index '$textName' under $textRoot"))
    val av = annVersion
      .orElse(Catalog.latestBundleVersion(spark, annRoot, annName))
      .getOrElse(sys.error(s"threeStageServeBundle: no committed " +
        s"versions for ANN index '$annName' under $annRoot"))
    val lex = TextIndex.bm25SearchBundle(spark, textRoot, textName,
        queryTerms, k = poolK, within = within, version = Some(tv))
      .select(col("doc_id").as("nid"), col("rank").cast("int").as("lrank"))
    // materialize = false: the MMR stage below collects the fused pool
    // within this same call (before any maintenance can land), so the
    // ANN serve's eager persist+count would be one extra action
    val vec = AnnIndex.knnBundle(spark, annRoot, annName, vecs, queryVec,
        k = poolK, rerank = rerank, nProbe = nProbe, within = within,
        version = Some(av), materialize = false)
      .select(col("nid"), col("rank").as("vrank"))
    val fused = rrfFuse(lex, vec, fuseK, rrfK)
    mmrRerankPool(vecs, queryVec, fused.select(col("nid")), k)
  }

  /** [[threeStageServeBundle]] with BOTH index versions resolved
    * through ONE committed deployment pin
    * ([[graft.sources.Catalog.readDeployment]]) — the serve a
    * production stack runs once maintenance spans several stores:
    * per-bundle pinning (x190) guarantees each index answers one
    * committed version, but a takedown hitting the text AND the ANN
    * store is two commits, and a serve resolving each store's latest
    * independently between them sees cross-store SKEW (the removed ids
    * gone from one retrieval side, still served by the other). Here
    * the ONLY mutable read is the deployment table's latest version —
    * everything downstream is pinned by the pin set — so maintenance
    * that retracts every store first and flips the deployment LAST is
    * atomic for the whole stack. `pins` keys are the bundle names
    * (`textName`, `annName`); `deploymentVersion` time-travels the
    * deployment itself.
    */
  def threeStageServeDeployed(spark: org.apache.spark.sql.SparkSession,
      depRoot: String, depName: String,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, queryTerms: Seq[String], queryVec: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      deploymentVersion: Option[Long] = None): DataFrame = {
    val pins = Catalog.readDeployment(spark, depRoot, depName,
      deploymentVersion)
    def pin(art: String): Long = pins.getOrElse(art,
      sys.error(s"threeStageServeDeployed: deployment '$depName' has no " +
        s"pin for artifact '$art' (pins: ${pins.keys.toSeq.sorted})"))
    threeStageServeBundle(spark, textRoot, textName, annRoot, annName,
      vecs, queryTerms, queryVec, k, fuseK, poolK, rrfK, rerank, nProbe,
      within, textVersion = Some(pin(textName)),
      annVersion = Some(pin(annName)))
  }

  /** [[threeStageServeBatchBundle]] with both index versions resolved
    * through ONE committed deployment pin — the bulk shape of
    * [[threeStageServeDeployed]]: a production evaluation runs its
    * query batches against the SAME deployment a single-query serve
    * answers from, and a batch that resolved each store's latest
    * independently would re-open, across N queries at once, the exact
    * mid-maintenance skew window x194 closed for one. The pin set is
    * read once (the only mutable read) and threaded as
    * `textVersion`/`annVersion` through every member read of both
    * stores; filters (`within`/`withinPairs`) and per-query semantics
    * are exactly [[threeStageServeBatchBundle]]'s.
    */
  def threeStageServeBatchDeployed(spark: org.apache.spark.sql.SparkSession,
      depRoot: String, depName: String,
      textRoot: String, textName: String, annRoot: String, annName: String,
      vecs: DataFrame, queryTerms: Seq[(Long, Seq[String])],
      queryVecs: DataFrame, k: Int,
      fuseK: Int = 30, poolK: Int = 50, rrfK: Int = 60, rerank: Int = 150,
      nProbe: Int = 6, within: Option[DataFrame] = None,
      withinPairs: Option[DataFrame] = None,
      deploymentVersion: Option[Long] = None): DataFrame = {
    val pins = Catalog.readDeployment(spark, depRoot, depName,
      deploymentVersion)
    def pin(art: String): Long = pins.getOrElse(art,
      sys.error(s"threeStageServeBatchDeployed: deployment '$depName' " +
        s"has no pin for artifact '$art' (pins: ${pins.keys.toSeq.sorted})"))
    threeStageServeBatchBundle(spark, textRoot, textName, annRoot, annName,
      vecs, queryTerms, queryVecs, k, fuseK, poolK, rrfK, rerank, nProbe,
      within, textVersion = Some(pin(textName)),
      annVersion = Some(pin(annName)), withinPairs = withinPairs)
  }

  /** Take a document set down from a DEPLOYED text+ANN serving stack —
    * [[graft.sources.Catalog.takedownStack]] instantiated for the
    * three-stage stack's two stores: retract `removed` from the text
    * index and the ANN index (each an atomic per-bundle commit,
    * ledger preserved), then flip the deployment pin LAST. Refuses a
    * deployment pinning anything besides exactly these two artifacts
    * (a partial takedown must not flip), and a failure in either
    * retraction leaves the pin — and every serve resolving it — on the
    * pre-takedown versions (CatalogSpec pins the crash story). Returns
    * the new pin set. `removed`: one id column (doc ids = vector ids
    * under the stack's alignment contract).
    */
  def takedownServingStack(spark: org.apache.spark.sql.SparkSession,
      root: String, deployment: String, textName: String, annName: String,
      removed: DataFrame): Map[String, Long] = {
    require(textName != annName,
      s"takedownServingStack: text and ANN bundles must differ, got '$textName'")
    Catalog.takedownStack(spark, root, deployment, Map(
      textName -> ((_: Long) =>
        TextIndex.retractBundle(spark, root, textName, removed)),
      annName -> ((_: Long) =>
        AnnIndex.retractBundle(spark, root, annName, removed))))
  }

  /** Exact cosine re-rank of a candidate shortlist: `pairs` (qid, nid)
    * joins back to the raw vectors and only those |queries| × shortlist
    * rows are scored exactly — the second stage of every
    * approximate-then-exact ANN scheme (ADC or IVF shortlist → exact
    * top-k). The candidate join is an equi-join on id (hash, prunable);
    * queries broadcast.
    */
  def rerankExact(pairs: DataFrame, candidates: DataFrame, queries: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = dotFor(candidates)
    val c = candidates.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(d(col("cvec"), col("cvec"))))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(d(col("qvec"), col("qvec"))))
    val scored = pairs.select(col("qid"), col("nid"))
      .join(c, Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(d(col("qvec"), col("cvec")) / (col("cn") * col("qn"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Deterministic Rademacher (±1) hyperplanes for sign-random-projection
    * LSH, seeded — the same plane set on every executor and every run.
    */
  def hyperplanes(dims: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dims)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Embedding width read from the data — one `LIMIT 1` job over the first
    * non-null vector. Used when the caller doesn't pass `dims` explicitly;
    * hyperplane width silently mismatching the data would hash every
    * vector onto a truncated prefix.
    */
  def vecDims(df: DataFrame, vecCol: String): Int = {
    val rows = df.select(size(col(vecCol)).as("d")).where(col("d") > 0)
      .limit(1).collect()
    require(rows.nonEmpty,
      s"vecDims: no non-empty '$vecCol' arrays to derive the embedding width from")
    rows.head.getInt(0)
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `outDims` dimensions via the seeded Rademacher (±1) matrix, scaled by
    * 1/√outDims — pairwise Euclidean geometry is preserved within ε w.h.p.
    * The cheap dimensionality cut before storing or brute-forcing over a
    * 100 TB vector corpus (4× fewer dims ⇒ 4× less I/O and FLOPs in every
    * downstream distance).
    *
    * The matrix is outDims × dims literals broadcast inside the plan; the
    * projection is a narrow map of outDims dot products per row — no
    * shuffle, whole-stage-codegen'd when GraftExtensions is enabled.
    */
  def randomProject(df: DataFrame, outDims: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", seed: Long = 42L,
      as: String = "proj"): DataFrame = {
    require(outDims > 0, s"outDims=$outDims must be positive")
    val d = dotFor(df)
    val dims = vecDims(df, vecCol)
    val planes = hyperplanes(dims, outDims, seed)
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val v = asDouble(col(vecCol))
    df.withColumn(as,
      array(planes.map(p => d(v, typedLit(p)) * scale): _*))
  }

  /** LSH bucket id: one sign bit per hyperplane packed into a long. Vectors
    * with high cosine similarity agree on most sign bits, so they land in
    * the same bucket with probability (1 - θ/π)^planes.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]],
      dotFn: (Column, Column) => Column = dot): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotFn(vec, typedLit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * then exact cosine re-rank. One hash-partition shuffle on bucket id
    * instead of a full cross join — the 100 TB path. Fewer planes → bigger
    * buckets → higher recall and cost.
    */
  def lshKnn(candidates: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame =
    lshKnnDims(candidates, queries, k, vecDims(candidates, vecCol), numPlanes,
      idCol, vecCol, seed)

  def lshKnnDims(candidates: DataFrame, queries: DataFrame, k: Int, dims: Int,
      numPlanes: Int, idCol: String, vecCol: String, seed: Long): DataFrame = {
    val planes = hyperplanes(dims, numPlanes, seed)
    val d = dotFor(candidates)
    val c = candidates.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), planes, d))
      .withColumn("cn", sqrt(d(col("cvec"), col("cvec"))))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), planes, d))
      .withColumn("qn", sqrt(d(col("qvec"), col("qvec"))))
    val scored = c.join(q, Seq("bucket"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(d(col("qvec"), col("cvec")) / (col("cn") * col("qn"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Spherical k-means centroids over an embedding column, trained with
    * Lloyd iterations — the trained coarse quantizer for `ivfKnn` (cosine
    * geometry: centroids are unit-normalized every round, assignment is
    * max inner product = max cosine).
    *
    * Scale shape per iteration: centroids broadcast as literals into ONE
    * narrow assignment map over the corpus; the update is a `groupBy
    * (cell, pos)` sum whose partial aggregation caps every map task's
    * exchange contribution at k×dims rows — the shuffled volume is
    * O(partitions × k × dims), independent of corpus size. The driver
    * holds k×dims doubles, never data.
    *
    * Init is the same deterministic hash-order sample `ivfKnn` uses
    * untrained, so trained == untrained at `iters = 0` (modulo
    * normalization). Empty cells keep their previous centroid.
    */
  def kmeansCentroids(df: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"kmeansCentroids: bad k=$k / iters=$iters")
    val d = dotFor(df)
    def unit(c: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var cents: IndexedSeq[Seq[Double]] = df
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .where(size(col("v")) > 0)
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(k).collect().toIndexedSeq
      .map(r => unit(r.getSeq[Double](1).toIndexedSeq))
    require(cents.nonEmpty, s"kmeansCentroids: no non-empty '$vecCol' vectors")
    val v = df.select(asDouble(col(vecCol)).as("vec")).where(size(col("vec")) > 0)
    for (_ <- 1 to iters) {
      val cell = nearestCentroid(col("vec"),
        cents.zipWithIndex.map { case (cv, i) => (i, cv) }, d)
      val sums = v.withColumn("cell", cell)
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(rows) =>
            val width = rows.map(_.getInt(1)).max + 1
            val mean = new Array[Double](width)
            rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
            unit(mean.toIndexedSeq)
          case None => old
        }
      }
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path next to sign-LSH. Coarse quantizer: `nCentroids` vectors chosen by
    * a deterministic hash-order sample of the corpus (`trainIters = 0`,
    * a k-medoids-style shortcut), or refined with that many spherical
    * k-means rounds (`kmeansCentroids`) — trained cells follow the data's
    * direction clusters, so the same nProbe recovers more true neighbors.
    * Every candidate is assigned to its nearest centroid (one shuffle by
    * centroid id); a query probes its `nProbe` nearest centroids and
    * re-ranks exactly within those inverted lists.
    *
    * At scale: assignment is a narrow map over the corpus; the probe join
    * touches nProbe/nCentroids of the data instead of all of it, and the
    * centroid table (nCentroids × dims doubles) broadcasts everywhere.
    */
  /** Nearest-centroid ids for a vector, as a sorted-by-score idx array —
    * max inner product ≈ nearest for same-norm centroids; deterministic
    * tie-break on idx. Shared by `ivfKnn` and the streaming index
    * maintenance (`VectorIngest`), so batch assignment and online
    * assignment can never drift apart.
    */
  def centroidRanks(vec: Column, centroids: Seq[(Int, Seq[Double])],
      dotFn: (Column, Column) => Column = dot): Column = {
    val scored = array(centroids.map { case (i, cv) =>
      struct(dotFn(vec, typedLit(cv)).as("s"), lit(i).as("idx"))
    }: _*)
    transform(
      array_sort(scored, (a, b) =>
        when(a.getField("s") > b.getField("s"), -1)
          .when(a.getField("s") < b.getField("s"), 1)
          .otherwise(a.getField("idx") - b.getField("idx"))),
      x => x.getField("idx"))
  }

  /** argmax_i dot(vec, c_i) as a single fold over the scored centroids —
    * the top-1 special case of [[centroidRanks]] with the IDENTICAL tie
    * rule (lowest idx wins), without materializing and sorting the full
    * score array: O(k) comparisons instead of O(k log k) struct sorts,
    * per row. Used everywhere only the nearest cell matters (k-means
    * assignment, spill-1 index assignment, streaming ingest).
    */
  def nearestCentroid(vec: Column, centroids: Seq[(Int, Seq[Double])],
      dotFn: (Column, Column) => Column = dot): Column = {
    val scored = array(centroids.map { case (i, cv) =>
      struct(dotFn(vec, typedLit(cv)).as("s"), lit(i).as("idx"))
    }: _*)
    aggregate(scored,
      struct(lit(Double.NegativeInfinity).as("s"), lit(-1).as("idx")),
      (acc, e) => when(e.getField("s") > acc.getField("s"), e).otherwise(acc),
      acc => acc.getField("idx"))
  }

  /** Corpus with a trained k-means `cell` column: `kmeansCentroids` fits
    * the quantizer (bounded driver state, k×dims doubles), then ONE narrow
    * assignment map tags every row with its nearest cell — no shuffle of
    * the corpus, the centroids ride into the plan as broadcast literals.
    * The semantic-clustering front half of diversity sampling
    * (`Training.sampleNPerGroup` over the cells) and of any
    * cluster-stratified corpus analytics.
    */
  def kmeansAssign(df: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = kmeansCentroids(df, k, iters, idCol, vecCol)
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    df.withColumn("cell", nearestCentroid(asDouble(col(vecCol)), cents, dotFor(df)))
  }

  /** Exact per-label mean embedding (unit-normalized by default), computed
    * DISTRIBUTED — `posexplode` → `groupBy(label, pos)` average, whose
    * map-side partial agg caps each task's exchange contribution at
    * labels×dims rows — then collected bounded (labels×dims doubles, never
    * data). The class-prototype table of centroid-based classification.
    */
  def labelCentroids(df: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding",
      unitNorm: Boolean = true): Seq[(Int, Seq[Double])] = {
    val rows = df
      .select(col(labelCol).cast("int").as("lab"), asDouble(col(vecCol)).as("v"))
      .where(col("lab").isNotNull && size(col("v")) > 0)
      .select(col("lab"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("lab"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .collect()
    require(rows.nonEmpty, s"labelCentroids: no labeled non-empty '$vecCol' vectors")
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (lab, rs) =>
      val width = rs.map(_.getInt(1)).max + 1
      val m = new Array[Double](width)
      rs.foreach(r => m(r.getInt(1)) = r.getDouble(2))
      val n = math.sqrt(m.map(x => x * x).sum)
      (lab, (if (unitNorm && n > 0) m.map(_ / n) else m).toIndexedSeq)
    }
  }

  /** Nearest-centroid confusion matrix: every vector is assigned to its
    * closest label PROTOTYPE (max dot against the unit-normalized label
    * means — cosine order, since the prototypes share norm 1) and counted
    * against its true label. The diagonal measures how separable the label
    * structure is in embedding space; off-diagonal mass names the confusable
    * pairs — the standard embedding-quality audit before trusting semantic
    * dedup or cluster-stratified sampling on those vectors.
    *
    * Scale shape: `labelCentroids` is the only driver traffic (labels×dims
    * doubles); assignment is one narrow map with the prototypes as broadcast
    * literals; the confusion aggregate is ≤ labels² rows. Scores are rounded
    * to `decimals` before the argmax (ties → lowest label), so any engine
    * replaying the same arithmetic assigns identically.
    */
  def labelConfusion(df: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding", decimals: Int = 6): DataFrame = {
    val cents = labelCentroids(df, labelCol, vecCol)
    val d = dotFor(df)
    val rd: (Column, Column) => Column = (a, b) => roundz(d(a, b), decimals)
    df.where(col(labelCol).isNotNull)
      .select(col(labelCol).cast("int").as("label"),
        nearestCentroid(asDouble(col(vecCol)), cents, rd).as("assigned"))
      .groupBy(col("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-ITEM mislabel audit — the row-level companion to the aggregate
    * [[labelConfusion]]: every vector scored (dot, cosine order) against
    * its OWN label's unit prototype, and the `k` WORST-scoring vectors per
    * label returned (rank by score asc, vec_id tie-break). These are the
    * candidates to re-annotate first: a low score says the item sits far
    * from its own label's mass in embedding space.
    *
    * Bottom-k (not a threshold) keeps the output deterministic and
    * non-empty at every corpus size. Scale shape: prototypes are the only
    * driver traffic (labels×dims doubles, broadcast back as literals); the
    * scoring is one narrow map; the per-label rank is a window over
    * `labels` partitions — parallel, with WindowGroupLimit bounding the
    * map-side sort to k rows per partition.
    */
  def labelOutliers(df: DataFrame, k: Int, labelCol: String = "label",
      vecCol: String = "embedding", idCol: String = "vec_id",
      decimals: Int = 6): DataFrame = {
    require(k >= 1, s"labelOutliers: k must be >= 1, got $k")
    val cents = labelCentroids(df, labelCol, vecCol)
    val d = dotFor(df)
    // own-label score: one CASE over the broadcast prototypes
    val ownScore = cents.foldLeft(lit(null).cast("double")) { case (acc, (lab, cv)) =>
      when(col("label") === lab,
        roundz(d(asDouble(col(vecCol)), typedLit(cv)), decimals)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("score").asc, col(idCol).asc)
    df.where(col(labelCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol), col(labelCol).cast("int").as("label"),
        col(vecCol))
      .withColumn("score", ownScore)
      .where(col("score").isNotNull)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(idCol), col("label"), col("score"), col("rn"))
  }

  /** Deterministic coarse-quantizer sample: smallest `nCentroids` ids by
    * hash order — the untrained (`trainIters = 0`) centroid set `ivfKnn`
    * uses, exposed so a caller can build the quantizer ONCE over the full
    * corpus and reuse it across differently-filtered searches
    * (`Embeddings.filteredIvfPqKnn`).
    */
  def sampleCentroids(candidates: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Seq[Double])] =
    candidates
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids)
      .collect()
      .toIndexedSeq
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toIndexedSeq) }

  def ivfKnn(candidates: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 0,
      precomputedCentroids: Option[Seq[(Int, Seq[Double])]] = None,
      spill: Int = 1): DataFrame = {
    require(spill >= 1, s"ivfKnn: spill=$spill must be >= 1")
    val d = dotFor(candidates)
    val c = candidates.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cn", sqrt(d(col("cvec"), col("cvec"))))
    // deterministic sample: smallest nCentroids ids by hash order; trained
    // centroids are unit-norm, so max-inner-product ranking = max cosine
    val centroids: Seq[(Int, Seq[Double])] = precomputedCentroids.getOrElse {
      if (trainIters > 0)
        kmeansCentroids(candidates, nCentroids, trainIters, idCol, vecCol)
          .toIndexedSeq.zipWithIndex.map { case (cv, i) => (i, cv) }
      else sampleCentroids(candidates, nCentroids, idCol, vecCol)
    }

    // spill > 1 = multi-cell assignment: a candidate lands in its `spill`
    // nearest inverted lists (index grows spill×), so boundary vectors —
    // the ones a single-cell IVF loses at low nProbe — stay reachable
    // from their second-closest cell too. Duplicate (qid, nid) pairs from
    // overlapping probes collapse before ranking.
    val assigned =
      if (spill == 1)
        c.withColumn("cell", nearestCentroid(col("cvec"), centroids, d))
      else
        c.withColumn("cell", explode(slice(
          graft.functions.Staging.pin(centroidRanks(col("cvec"), centroids, d)),
          1, spill)))
    val probed = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("qn", sqrt(d(col("qvec"), col("qvec"))))
      .withColumn("__ranks", centroidRanks(col("qvec"), centroids, d))
      .withColumn("cell", explode(slice(graft.functions.Staging.pin(col("__ranks")), 1, nProbe)))
      .drop("__ranks")
    val joined = assigned.join(probed, Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("cn") * col("qn") === 0, lit(0.0d))
          .otherwise(d(col("qvec"), col("cvec")) / (col("cn") * col("qn"))).as("sim"))
    val scored = if (spill == 1) joined else joined.dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b) with sim ≥ threshold,
    * via LSH buckets (no O(n²)). Recall < 1 by construction; raise recall
    * with fewer planes or multiple seeded rounds. `dims` ≤ 0 (the default)
    * reads the embedding width from the data.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, dims: Int = -1,
      numPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    val planes = hyperplanes(if (dims > 0) dims else vecDims(df, vecCol), numPlanes, seed)
    val d = dotFor(df)
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), planes, d))
      .withColumn("nrm", sqrt(d(col("vec"), col("vec"))))
    val a = v.select(col("bucket"), col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
    val b = v.select(col("bucket"), col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        when(col("na") * col("nb") === 0, lit(0.0d))
          .otherwise(d(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), roundz(col("sim"), 4).as("sim"))
      .distinct()
  }

  // --------------------------------------- incremental (batch vs corpus)

  /** Sign-LSH bucket index of a vector table: (idCol, bucket), one row per
    * vector. The bucket is a pure function of the embedding and the seeded
    * plane set, so a growing corpus computes it ONCE at ingest and stores
    * it as a table — the semantic-dedup analog of `Dedup.lshBuckets`.
    * Rebuild is only ever needed if (numPlanes, seed) change.
    */
  def cosineLshIndex(df: DataFrame, dims: Int = -1, numPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(if (dims > 0) dims else vecDims(df, vecCol), numPlanes, seed)
    val d = dotFor(df)
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol), lshBucket(col("__v"), planes, d).as("bucket"))
  }

  /** Cosine near-dup matches of a new batch against a PRECOMPUTED corpus
    * bucket index ((new_id, corpus_id, sim ≥ threshold)) — the steady-state
    * ingest path of semantic dedup (x92's batch-over-batch shape, mirroring
    * `Dedup.incrementalMinhashMatchesWithIndex`):
    *   - the batch is bucketed with the SAME seeded planes ((numPlanes,
    *     seed) must match the index build), and the join keys on bucket, so
    *     a new vector only ever meets its bucket-mates — never corpus×batch;
    *   - the corpus side is the 100 TB one, so its oversized buckets are
    *     dropped by `maxBucketSize` (same skew policy as the index-less
    *     `cosineNearDupPairs`);
    *   - only vectors that appear in a candidate pair are re-read for the
    *     exact cosine verify (semi-join pruning on both sides), so the
    *     verify work is candidate-sized, not corpus-sized.
    * Identical vectors agree on every sign bit, so an exact cross-batch
    * copy ALWAYS meets its source (recall 1 on planted copies); recall on
    * merely-near pairs is the usual (1 − θ/π)^planes LSH trade.
    */
  def incrementalCosineMatchesWithIndex(newDf: DataFrame, corpus: DataFrame,
      corpusIndex: DataFrame, threshold: Double, dims: Int = -1,
      numPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    val planes = hyperplanes(if (dims > 0) dims else vecDims(newDf, vecCol), numPlanes, seed)
    val d = dotFor(newDf)
    val nb = newDf.select(col(idCol).as("new_id"), asDouble(col(vecCol)).as("__v"))
      .select(col("new_id"), lshBucket(col("__v"), planes, d).as("bucket"))
    val safeCb = corpusIndex
      .select(col(idCol).as("corpus_id"), col("bucket"))
      .withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket"))))
      .where(col("__n") <= maxBucketSize).drop("__n")
    val cands = nb.join(safeCb, Seq("bucket"))
      .select(col("new_id"), col("corpus_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def pruned(side: DataFrame, keyAs: String): DataFrame =
        side.join(cands.select(col(keyAs).as(idCol)).distinct(), Seq(idCol), "left_semi")
          .select(col(idCol).as(keyAs), asDouble(col(vecCol)).as(s"__v_$keyAs"))
          .withColumn(s"__n_$keyAs", sqrt(d(col(s"__v_$keyAs"), col(s"__v_$keyAs"))))
      val verified = cands
        .join(pruned(newDf, "new_id"), Seq("new_id"))
        .join(pruned(corpus, "corpus_id"), Seq("corpus_id"))
        .select(col("new_id"), col("corpus_id"),
          when(col("__n_new_id") * col("__n_corpus_id") === 0, lit(0.0d))
            .otherwise(d(col("__v_new_id"), col("__v_corpus_id")) /
              (col("__n_new_id") * col("__n_corpus_id"))).as("sim"))
        .where(col("sim") >= threshold)
        .select(col("new_id"), col("corpus_id"), roundz(col("sim"), 4).as("sim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      verified.count()
      verified
    } finally cands.unpersist()
  }

  /** The new batch with semantic (cosine ≥ threshold) duplicates of the
    * corpus removed — the per-ingest decontamination step of a continuously
    * growing embedded corpus, against the stored `cosineLshIndex`.
    * Within-batch duplicates are a separate, composable concern (x92's
    * full-cluster pass on the batch itself), exactly as in
    * `Dedup.incrementalDedup`.
    */
  def incrementalSemanticDedup(newDf: DataFrame, corpus: DataFrame,
      corpusIndex: DataFrame, threshold: Double, dims: Int = -1,
      numPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    // matches are persisted+materialized (same contract as minhashPairs);
    // one-shot callers free them with the session cache
    val matched = incrementalCosineMatchesWithIndex(newDf, corpus, corpusIndex,
      threshold, dims, numPlanes, idCol, vecCol, seed, maxBucketSize)
    newDf.join(matched.select(col("new_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }
}
