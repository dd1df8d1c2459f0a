package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lifecycle

/** Iterative graph computation as repeated relational passes — the family
  * the rest of the engine lacks: every other operator is a bounded number
  * of scans/joins/aggs, while PageRank-style ranking needs a DRIVER LOOP
  * over cluster-side joins (the reference has nothing like it; this is the
  * standard "importance over a link graph" primitive a training-data
  * pipeline uses to weight crawled sources by their link structure, in the
  * spirit of the original PageRank paper — Brin & Page 1998, public).
  *
  * Shape per iteration (all declarative — Catalyst plans each pass):
  *
  *   contribs = edges ⋈ ranks on src, each edge carries rank(src)/outdeg(src)
  *   ranks'   = nodes ⟕ (contribs groupBy dst: sum) → (1-d)/N + d·(in-mass)
  *
  * Scale posture:
  *   - the edge list (with out-degrees pre-joined) is the loop invariant:
  *     cached ONCE via the audited lifecycle and hash-partitioned on `src`,
  *     so every iteration's join re-reads co-located cached blocks instead
  *     of re-shuffling the (edge-count-sized) relation; only the node-sized
  *     rank frame moves per iteration.
  *   - nothing edge- or node-sized ever reaches the driver: the single
  *     driver-side value is the node COUNT (one Long action) feeding the
  *     teleport constant. Ranks stay distributed end to end.
  *   - lineage grows linearly with iterations (each ranks' references the
  *     previous plan once). For the fixed shallow sweeps a corpus audit
  *     runs (3-10 iterations) that is the cheapest correct form; past ~15
  *     iterations a caller should break lineage with
  *     `localCheckpoint()` every ~10 passes — documented rather than
  *     hard-coded so short sweeps never pay a checkpoint write.
  *   - skew: a celebrity dst node concentrates its SUM, not its rows —
  *     partial (map-side) aggregation folds each partition's contributions
  *     before the exchange, so the hot key moves one row per partition,
  *     the same protection every groupBy in the engine leans on.
  */
object Graph {

  /** Directed edge list (`srcCol`, `dstCol`) → per-node PageRank after
    * exactly `iters` power-iteration passes from the uniform start, with
    * damping `d` (teleport probability 1-d).
    *
    * Node universe = every id appearing as src OR dst; edges are deduped.
    * Dangling nodes (no out-edge) emit no mass; with
    * `redistributeDangling` their pooled rank is returned to every node
    * uniformly each pass (the strict PageRank fix-up — total mass stays 1
    * instead of leaking), at the cost of one extra bounded aggregate per
    * iteration. Symmetric graphs have no dangling nodes; callers that
    * symmetrize can leave it off.
    *
    * Deterministic given the graph: seeds nothing, samples nothing — safe
    * for hash-compared oracles once ranks are rounded.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame =
    personalizedPageRank(edges, srcCol, dstCol, None, iters, damping,
      redistributeDangling)

  /** HITS hubs & authorities (Kleinberg 1999, public) over a DIRECTED
    * edge list — the natural rank pair for bipartite interaction graphs
    * (curator→source, customer→supplier): a good hub points at good
    * authorities and vice versa.
    *
    * Runs `iters` UN-normalized mutual-reinforcement passes
    * (auth = Eᵀ·hub, hub = E·auth) and L2-normalizes ONCE at output:
    * normalization is a pure rescale that commutes with the linear
    * updates, so the normalized result is identical to the textbook
    * per-pass-normalized iteration — and skipping it keeps every pass a
    * single reference to the previous frame (linear lineage, zero
    * intermediate actions, one lazy Catalyst plan; overflow is not a
    * concern at shallow depths — values grow like degreeⁱ, ~1e15 at
    * i = 3 on a million-degree graph, well inside double range).
    * Per-pass cost: two key-partitioned join+agg passes against the
    * CACHED edge invariant; skew is absorbed by map-side partial sums
    * exactly as in [[pageRank]].
    *
    * Output: (node, hub, auth) over the full node universe — zeros for
    * the side a node never plays (a pure authority has hub 0).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .repartition(col("src"))
    Lifecycle.withCachedInputs(e) {
      // init: hub 1 on every source (non-sources contribute nothing to
      // auth sums, so the textbook all-ones start reduces to this)
      var hubs = e.select(col("src")).distinct().withColumn("h", lit(1.0))
      var auths = e.join(hubs, "src").groupBy(col("dst"))
        .agg(sum(col("h")).as("a"))
      hubs = e.join(auths, "dst").groupBy(col("src"))
        .agg(sum(col("a")).as("h"))
      for (_ <- 2 to iters) {
        auths = e.join(hubs, "src")
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
        hubs = e.join(auths, "dst").groupBy(col("src"))
          .agg(sum(col("a")).as("h"))
      }
      Lifecycle.withCachedInputs(hubs, auths) {
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
        val nh = hubs.agg(sqrt(sum(col("h") * col("h"))).as("__nh"))
        val na = auths.agg(sqrt(sum(col("a") * col("a"))).as("__na"))
        nodes
          .join(hubs.select(col("src").as("node"), col("h")), Seq("node"), "left")
          .join(auths.select(col("dst").as("node"), col("a")), Seq("node"), "left")
          .crossJoin(broadcast(nh)).crossJoin(broadcast(na))
          .select(col("node"),
            (coalesce(col("h"), lit(0.0)) / col("__nh")).as("hub"),
            (coalesce(col("a"), lit(0.0)) / col("__na")).as("auth"))
      }
    }
  }

  /** Seeded (personalized) PageRank — the TrustRank pattern (Gyöngyi,
    * Garcia-Molina & Pedersen, VLDB'04, public): the teleport mass lands
    * ONLY on the `seeds` node set instead of uniformly, so rank flows
    * outward from trusted sources and decays with link distance — the
    * standard way to propagate source quality over a link graph when a
    * small allowlist is all the ground truth a corpus has. `seeds = None`
    * degenerates to uniform teleport (classic PageRank).
    *
    * Seeds arrive as a DataFrame (single node-id column) because at corpus
    * scale the allowlist is itself a table: membership becomes a `__t`
    * teleport column on the cached node frame (one semi-join at build,
    * free per iteration), and the only extra driver value is the seed
    * COUNT. The start vector is the teleport vector (mass on seeds), as
    * the paper specifies. Dangling nodes: same contract/mechanics as
    * [[pageRank]], except redistributed mass returns via the teleport
    * vector (seed-proportional), keeping the personalization exact.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Option[DataFrame], iters: Int = 3, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
    // loop invariant: edges with their out-degree, partitioned on the join
    // key so iterations re-read co-located cache instead of re-shuffling
    val ej = e.join(outDeg, "src").repartition(col("src"))
    Lifecycle.withCachedInputs(ej) {
      // node universe DERIVED FROM THE CACHED invariant (ej ≡ e with the
      // out-degree attached — an inner join every edge survives), so the
      // distinct and the count below re-read cache; deriving nodes from
      // the raw edge list instead re-ran the whole dedup/join/repartition
      // pipeline once per materialization (3× at sf0.1)
      val nodes0 = ej.select(col("src").as("node"))
        .union(ej.select(col("dst").as("node"))).distinct()
      // seed membership becomes a column ON the cached node frame (one
      // broadcast-able join at build time, free per iteration)
      val nodesS = seeds match {
        case None => nodes0.withColumn("__s", lit(1L))
        case Some(sd) =>
          val sn = sd.select(col(sd.columns.head).as("node")).distinct()
          nodes0.join(sn.withColumn("__s1", lit(1L)), Seq("node"), "left")
            .select(col("node"), coalesce(col("__s1"), lit(0L)).as("__s"))
      }
      Lifecycle.withCachedInputs(nodesS) {
      // node count + seed count in ONE bounded driver action (the
      // withCachedInputs count already materialized the cache; this agg
      // re-reads it)
      val cnts = nodesS.agg(count(lit(1)), coalesce(sum(col("__s")), lit(0L)))
        .head()
      val n = cnts.getLong(0)
      require(n > 0, "pageRank: empty graph")
      val nSeeds = seeds.fold(n)(_ => cnts.getLong(1))
      require(nSeeds > 0, "personalizedPageRank: no seed appears in the graph")
      // per-node teleport vector t (Σt = 1): uniform 1/n, or 1/|S| on seeds
      val nodes = nodesS.select(col("node"),
        (col("__s").cast("double") / nSeeds).as("__t"))
      // start at the teleport vector (TrustRank's start; uniform mode this
      // IS the classic uniform start)
      var ranks = nodes.select(col("node"), col("__t").as("rank"))

      def step(r: DataFrame, danglingMass: Double): DataFrame = {
        val contribs = ej
          .join(r.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") / col("__outdeg")).as("__in"))
        // rank' = (1−d)·t + d·(in + dm·t): teleport AND redistributed
        // dangling mass both land along the teleport vector, so the
        // personalization stays exact (uniform mode reduces to the
        // classic (1−d)/n + d·(in + dm/n))
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            ((lit(1.0 - damping) + lit(damping * danglingMass)) * col("__t")
              + lit(damping) * coalesce(col("__in"), lit(0.0)))
              .as("rank"))
      }

      if (!redistributeDangling) {
        // pure-lazy loop: each iteration references the previous ranks plan
        // exactly once, so lineage grows LINEARLY and the whole sweep is
        // one Catalyst plan with zero intermediate actions
        for (_ <- 1 to iters) ranks = step(ranks, 0.0)
        ranks
      } else {
        // strict-PageRank mode needs the previous iteration's ranks twice
        // (contributions AND the dangling-mass pool). Referencing one lazy
        // plan twice per pass would double the lineage every iteration, so
        // this mode materializes the node-sized state per pass — the GraphX
        // posture: cache the new state, fold the dangling pool to ONE
        // driver Double, release the old state
        // derived from the CACHED ej (not the raw edge list), so the
        // per-iteration pool aggregate re-reads cache, never the source
        val danglingNodes = nodes.join(
          ej.select(col("src").as("node")), Seq("node"), "left_anti")
        ranks = ranks.persist()
        for (_ <- 1 to iters) {
          val dm = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
          val next = step(ranks, dm).persist()
          next.count() // node-sized materialization; frees prev for release
          ranks.unpersist(false)
          ranks = next
        }
        ranks
      }
      }
    }
  }

  /** Max-decay label propagation: spread seed scores over a graph so a
    * node's score is `max over all paths of seed(start)·decayᵈⁱˢᵗ` after
    * `iters` hops — the "contamination contagion" primitive: flag a few
    * known-bad documents, propagate over the NEAR-DUP edge graph, and
    * every doc within k dedup-hops of a bad seed carries a decayed flag
    * (x42 finds direct benchmark overlap; this finds the near-copies of
    * the near-copies). Max semantics (not sum/avg) because dup edges are
    * evidence of shared content, not additive mass — one bad neighbor is
    * enough.
    *
    * `seeds` must carry the FULL node universe (node, score; non-seeds
    * 0) — the output keys on it. Per iteration: one join of the cached
    * symmetric edge list with the node-sized score frame, one max-agg by
    * dst (map-side partials absorb hub skew), one greatest() against the
    * previous scores. Lineage stays linear; nothing graph-sized reaches
    * the driver.
    */
  def maxPropagate(edges: DataFrame, seeds: DataFrame, iters: Int,
      decay: Double, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", scoreCol: String = "score"): DataFrame = {
    require(iters >= 1, s"maxPropagate: iters must be >= 1, got $iters")
    require(decay > 0 && decay <= 1, s"maxPropagate: decay $decay outside (0,1]")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().repartition(col("__src"))
    Lifecycle.withCachedInputs(e) {
      var s = seeds.select(col(nodeCol).as(nodeCol),
        col(scoreCol).cast("double").as("__s"))
      for (_ <- 1 to iters) {
        val nbr = e.join(s, col("__src") === col(nodeCol))
          .groupBy(col("__dst").as("__n"))
          .agg(max(col("__s")).as("__m"))
        s = s.join(nbr, col(nodeCol) === col("__n"), "left")
          .select(col(nodeCol),
            greatest(col("__s"),
              lit(decay) * coalesce(col("__m"), lit(0.0))).as("__s"))
      }
      s.select(col(nodeCol), col("__s").as(scoreCol))
    }
  }

  /** Triangle census of an undirected graph — how CLIQUISH the near-dup
    * graph is: many triangles mean tight duplicate families (dedup keeps
    * one representative per clique); a triangle-free pair soup means
    * chains of borderline matches where transitive clustering (x41)
    * over-merges. Degree-ordered orientation makes the count skew-safe:
    * every edge points from its (degree, id)-smaller endpoint, so a hub
    * of degree d contributes wedges only through its few HIGHER-degree
    * neighbors instead of C(d,2) pairs — the standard trick that keeps
    * the wedge join linear-ish on power-law graphs. Each triangle is
    * counted exactly once (its orientation is a DAG path u→v→w plus the
    * closing edge u→w), and the count is orientation-invariant, so an
    * id-ordered SQL replay agrees. Wedge total Σ C(d,2) and the global
    * clustering coefficient 3·triangles/wedges ride along (coefficient
    * null on a wedge-free graph).
    *
    * Output, one row: (n_nodes, n_edges, n_triangles, n_wedges,
    * global_clustering round-6).
    */
  /** Rounds-bounded k-core peel (Seidman 1983's coreness; the
    * Batagelj–Zaveršnik peel re-expressed as relational rounds —
    * public): repeatedly drop nodes whose degree among SURVIVORS is
    * < k. Undirected: edges canonicalize + symmetrize in one pass (the
    * exploded struct-array idiom — a union with the swapped frame would
    * run the upstream plan twice). Output after `rounds` peels, or the
    * earlier fixpoint: (node, degree) of survivors with degree measured
    * within the surviving subgraph — the rounds-bounded upper
    * approximation of the true k-core, exact whenever the peel
    * converges within `rounds` (the early-stop makes extra rounds
    * no-ops, so a fixed-round replay agrees regardless).
    *
    * Scale: the symmetric edge list is the cached loop invariant; each
    * round is two semi-joins against a node-sized alive set + one
    * map-side-combined degree aggregate. ONLY the survivor COUNT
    * reaches the driver (the early-stop scalar); alive sets persist
    * round-to-round and unpersist once the next round materializes, so
    * lineage stays shallow at any `rounds`.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"kCore: k=$k rounds=$rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .persist(lvl)
    def degrees(alive: DataFrame): DataFrame =
      sym.join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .select(col("src").as("node"), col("degree"))
    // round 1 needs no alive filter: every node of `sym` starts alive,
    // so the first degree pass is a plain aggregate over the invariant
    var deg = sym.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .select(col("src").as("node"), col("degree")).persist(lvl)
    try {
      // output after r peels IS the (r+1)-th degree frame; at the
      // fixpoint (no node dropped) the next frame equals the current
      // one, so the converged case returns `deg` without another pass
      var prevN = deg.count()
      var r = 0
      var converged = false
      while (r < rounds && !converged) {
        val alive = deg.where(col("degree") >= k).select(col("node"))
        val a = alive.count() // cheap: a filter over the cached frame
        if (a == prevN) converged = true
        else {
          val next = degrees(alive).persist(lvl)
          next.count()
          deg.unpersist()
          deg = next
          prevN = a
          r += 1
        }
      }
      deg
    } finally { sym.unpersist(); () }
  }

  def triangleStats(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    Lifecycle.withCachedInputs(e, deg) {
      val ori = e
        .join(deg.select(col("x").as("u"), col("d").as("__du")), Seq("u"))
        .join(deg.select(col("x").as("v"), col("d").as("__dv")), Seq("v"))
        .select(
          when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
            struct(col("u").as("s"), col("v").as("t")))
            .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("__e"))
        .select(col("__e.s").as("s"), col("__e.t").as("t"))
      val tri = ori.as("e1")
        .join(ori.as("e2"), col("e1.t") === col("e2.s"))
        .join(ori.as("e3"),
          col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
        .agg(count(lit(1)).as("n_triangles"))
      val sizes = deg.agg(
        count(lit(1)).as("n_nodes"),
        coalesce(sum(shiftright(col("d") * (col("d") - 1), 1)), lit(0L))
          .as("n_wedges"))
      val nEdges = e.agg(count(lit(1)).as("n_edges"))
      nEdges.crossJoin(broadcast(sizes)).crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          col("n_wedges"),
          when(col("n_wedges") === 0, lit(null).cast("double"))
            .otherwise(graft.functions.Num.roundz(
              lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
            .as("global_clustering"))
    }
  }
}
