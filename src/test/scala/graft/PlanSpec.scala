package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for scale-critical queries: the properties that
  * decide whether a plan survives a 100× scale-up (broadcast vs shuffle,
  * pushdown, no accidental nested loops) — pinned so a refactor that
  * silently degrades a plan fails CI, not the cluster.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q3: segment filter is pushed into the customer parquet scan") {
    val p = planOf("q3_top_orders")
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"), p.take(2000))
  }

  test("s9: the date filter prunes partitions at listing, not per-row") {
    // PartitionFilters (not just PushedFilters) is what turns a 100 TB
    // table scan into a 7-directory scan — the filter must bind to the
    // Hive partition column, and the executed scan must touch exactly the
    // 7 of 30 day-directories the week filter selects
    val df = SparkEntry.queries("s9_partitioned_prune")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"), s"no partition filter bound: $pf")
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // the executed scan sits inside AQE query stages — descend through them
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case other                    => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no FileSourceScanExec in executed plan"))
    assert(scan.metrics("numPartitions").value === 7,
      s"expected 7 hive partitions read, got ${scan.metrics("numPartitions").value}")
  }

  test("x87 filtered ANN: the label predicate prunes the index UNDER the cell-probe join") {
    // filtered ANN must prune the inverted lists, not the top-k output: the
    // label filter has to sit BELOW the join on cell (pushed into the
    // persisted index scan). A post-filter-shaped regression would hoist it
    // above the rank window — and under-return exactly when the filter is
    // selective.
    val p = planOf("x87_filtered_ann")
    val lines = p.linesIterator.toIndexedSeq
    val joinIdx = lines.indexWhere(_.contains("Join [cell"))
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("label"))
    assert(joinIdx >= 0, "no cell-probe join in plan:\n" + p.take(2000))
    assert(filterIdx > joinIdx,
      s"label filter not under the probe join (filter@$filterIdx join@$joinIdx)")
    val scanIdx = lines.indexWhere(
      l => l.contains("InMemoryTableScan") && l.contains("label"), filterIdx)
    assert(scanIdx > filterIdx, "filter does not read the persisted shared index")
  }

  test("s11: box predicates push into the z-ordered parquet scan") {
    // both clustering columns' range predicates must reach the parquet
    // reader as PushedFilters — that, plus the narrow per-file min/max
    // spans the z-layout guarantees (CatalogSpec), is what row-group
    // prunes the scan on EITHER column at 100 TB
    val p = planOf("s11_zorder_scan")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("o_custkey") && pushed.contains("o_totalprice"),
      s"box predicates not pushed:\n$pushed\n${p.take(1500)}")
  }

  test("x98: bloom probe filters the batch UNDER the verify semi-join") {
    // the sketch probe must run map-side on the batch scan, BELOW the
    // exact semi-join — hoisted above it, the shuffle would carry the
    // whole batch and the prefilter would prune nothing
    val p = planOf("x98_bloom_incremental_dedup")
    val lines = p.linesIterator.toIndexedSeq
    val joinIdx = lines.indexWhere(_.contains("LeftSemi"))
    val bloomIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0, "no semi-join in plan:\n" + p.take(2000))
    assert(bloomIdx > joinIdx,
      s"bloom probe not under the verify join (bloom@$bloomIdx join@$joinIdx):\n" + p.take(2000))
  }

  test("x86 substring dedup: duplicate counts partial-agg map-side, no window-by-shingle") {
    // the dup marking must be groupBy(shingle)+semi-join (map-side combine,
    // AQE-splittable), never `count over (partition by shingle)` — a window
    // pins every copy of a hot boilerplate shingle into one task
    val p = planOf("x86_substring_dedup")
    assert(p.contains("partial_count"), p.take(2000))
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("perceptual-hash dedup (x88/x90/x91): banded pair joins never degrade to loops") {
    for (q <- Seq("x88_image_phash_neardup", "x90_audio_fp_neardup",
        "x91_multimodal_dedup")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p.take(2000))
      // pairing must stay keyed: the banded bucket groupBy (collect_list
      // per (band, chunk)) is what makes pair generation non-quadratic.
      // x91's pair stage sits behind connectedComponents' eager
      // localCheckpoint and is not visible in its final plan — it shares
      // hammingPairs with x88, whose plan pins it.
      if (q != "x91_multimodal_dedup")
        assert(p.contains("collect_list"), s"$q:\n" + p.take(2000))
    }
    // x88/x90 end in intended 1-row stat cross joins (broadcast-NL over
    // single-row aggregates, the annRecallCheck shape); x91's cluster map
    // has no such presentation stage, so there a BNLJ can only be an
    // accidental unkeyed data join — ban it outright
    assert(!planOf("x91_multimodal_dedup").contains("BroadcastNestedLoopJoin"))
  }

  test("x42 contamination: benchmark index joins broadcast, never shuffles the corpus side") {
    val p = planOf("x42_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("x44 attribution: interval join keys on user_id equality, not a nested loop") {
    val p = planOf("x44_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("p2 projection: parquet scan reads only the projected columns") {
    val p = planOf("p2_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment"), readSchema)
  }

  test("j1 broadcast lookup: dimension side broadcasts") {
    val p = planOf("j1_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("x19 top-k: partial WindowGroupLimit runs below the exchange") {
    // row_number() <= k over a 5-value partition key is only scale-safe
    // because each map task pre-filters to its local per-group top-k; if a
    // refactor loses the rank filter pushdown, the 5 reducers sort the table
    val p = planOf("x19_rank_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("Partial"), p.take(2000))
  }

  test("x49 hash split plans as a narrow map: no exchange before the sort") {
    val df = SparkEntry.queries("x49_train_split")(spark, sfDir)
    // drop the presentation orderBy: the operator itself must not shuffle
    val core = graft.operators.Training.hashSplit(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id"), "doc_id")
    assert(!core.queryExecution.executedPlan.toString.contains("Exchange"),
      core.queryExecution.executedPlan.toString.take(2000))
    assert(df.columns.toSeq === Seq("doc_id", "bucket", "split"))
  }

  test("x45 curation: the dedup semi-join never degrades to a loop join") {
    val p = planOf("x45_curation")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("x50 packing: the running offset windows by shard, never globally") {
    val p = planOf("x50_pack_sequences")
    assert(p.contains("windowspecdefinition(shard"), p.take(2000))
  }

  test("x52 incremental dedup: batch meets corpus only through bucket keys") {
    val p = planOf("x52_incremental_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("s10 bucketed join: zero exchanges in the executed SortMergeJoin") {
    // the whole point of paying bucketBy at write time: the recurring join
    // must read co-located buckets with NO shuffle on either side. Force
    // the sort-merge path (broadcast would hide the exchange anyway) and
    // plan with AQE off so the assertion targets the static bucketed shape.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // the aggregation/sort ABOVE the join legitimately shuffle; the pin
      // is that the join subtree itself reads buckets with no exchange
      val plan = SparkEntry.queries("s10_bucketed_join")(spark, sfDir)
        .queryExecution.executedPlan
      val smjs = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, "no SortMergeJoin in plan:\n" + plan.toString.take(2000))
      val shuffles = smjs.flatMap(_.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      })
      assert(shuffles.isEmpty,
        "bucketed join shuffles:\n" + plan.toString.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("x94 incremental semantic dedup: batch meets corpus only through bucket keys") {
    // the batch must reach the corpus via the precomputed bucket index —
    // an all-pairs regression would surface as a loop join of batch×corpus
    val p = planOf("x94_incremental_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("q6: all three predicates push into the lineitem parquet scan") {
    val p = planOf("q6_forecast_revenue")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), pushed)
  }

  test("x60 unigram LM: vocabulary leaves executors only as a TakeOrdered, scoring joins broadcast") {
    // the operator runs driver actions (top-V, N) during plan construction;
    // pin the scoring plan's shape instead of the whole query execution
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = graft.functions.TextStats.unigramLogProb(docs, "doc_id", "text", 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("x84 DSIR weights: both LM vocabs broadcast into the scoring join, no loop join") {
    // same contract as x60 doubled: the corpus-sized token stream joins two
    // K-bounded vocab tables — both must broadcast, and a vocab collapsing
    // to a nested loop would be corpus × vocab
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = graft.functions.TextStats.importanceWeights(
        docs, docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
        "doc_id", "text", 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("x62 winsorize: the clip is a broadcast bounds join, the data never re-shuffles") {
    val df = graft.operators.Stats.winsorize(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_extendedprice")
    val p = df.queryExecution.executedPlan.toString
    // the only join is the 1-row bounds broadcast; no hash exchange of lineitem
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("x66 anomalies: the bucket-stats join broadcasts, events shuffle only for stats") {
    val p = planOf("x66_value_anomalies")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("x73 weighted sample: partial WindowGroupLimit bounds the map-side forward") {
    // same contract as x69: each map task forwards at most n rows per
    // group, so the weighted sample never funnels a source's full rows
    // through one reducer
    val p = planOf("x73_weighted_sample")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("Partial"), p.take(2000))
  }

  test("x82 composed keep-best: the persisted cluster pass is reused, not recomputed") {
    // the whole point of the composition is ONE LSH+CC pass feeding both
    // the survivor decision and the attached cluster_id — both references
    // must read the InMemoryRelation, or the plan pays clustering twice
    val p = planOf("x82_cluster_keep_best")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      p.take(2000))
  }

  test("x85 DSIR resample: top-k per source bounds map-side rows via WindowGroupLimit") {
    // same contract as x73: the weighted sample must never funnel a
    // source's full rows through one reducer
    val p = planOf("x85_dsir_resample")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("x74 token budget: the prefix sum windows by (source, bucket), never by source alone") {
    val p = planOf("x74_token_budget_mix")
    assert(p.contains("windowspecdefinition(source"), p.take(2000))
    assert(p.contains("__bkt"), p.take(2000))
    // offsets arrive by broadcast, not a shuffled join
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("x75 incremental SCD2: untouched keys leave via anti join, affected via semi") {
    val p = planOf("x75_scd2_incremental")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("x76 PQ encode is a narrow map: no exchange, codebooks live as literals") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val books = graft.operators.Embeddings.pqTrain(
      e.limit(64), m = 8, k = 4, iters = 0)
    val enc = graft.operators.Embeddings.pqEncode(e, books)
    val p = enc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("x101 CMS estimate: the bounded sketch broadcasts into the probe join") {
    // the sketch table is depth×width rows no matter the corpus; if it ever
    // shuffles the probe stream into a SortMergeJoin the bounded-state story
    // is gone — build + estimate on a corpus-shaped token stream and pin
    val tk = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextStats.tokens(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")))).as("tok"))
    val sketch = graft.operators.Sketches.cmsBuild(tk, "tok", 3, 16)
    val est = graft.operators.Sketches.cmsEstimate(
      tk.limit(10), "tok", sketch, 3, 16)
    val p = est.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("x102 label confusion: prototype assignment is joinless, one agg exchange") {
    // the prototypes ride into the plan as broadcast literals — assignment
    // must be a narrow projection (no join of any kind); the only shuffles
    // are the bounded labels² confusion agg and the presentation sort
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = graft.operators.Similarity.labelConfusion(e)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
  }

  test("x99 diverse sample: per-cell cap runs as partial WindowGroupLimit") {
    // sampleNPerGroup over the k-means cells must pre-filter map-side (each
    // task forwards ≤ n rows per cell) — same contract as x19/x73
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val assigned = graft.operators.Similarity.kmeansAssign(e, k = 4, iters = 0)
    val p = graft.operators.Training
      .sampleNPerGroup(assigned, Seq("cell"), "vec_id", 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("Partial"), p.take(2000))
  }

  test("x105/x111 pagerank: edge list iterates from cache, no loop joins") {
    // the loop invariant (edges + out-degrees) must be an InMemoryRelation
    // — re-deriving it per iteration re-scans and re-shuffles the
    // edge-count-sized relation every pass — and a rank update must never
    // degrade to a nested-loop join
    for (q <- Seq("x105_pagerank", "x111_trustrank")) {
      val p = planOf(q)
      assert(p.contains("InMemoryTableScan"), s"$q:\n" + p.take(2000))
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q:\n" + p.take(2000))
    }
    // x113 attaches its two 1-row norm scalars via broadcast cross joins
    // (the standard bounded-aggregate attach — N×1, not N×M), so only an
    // unbroadcast CartesianProduct would be a degradation there
    val p = planOf("x113_hits")
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("x106/x108 prefix-filtered joins: key-partitioned, never a product") {
    // the whole point of the prefix filter is that candidates come from an
    // equality join on prefix tokens — any CartesianProduct or
    // BroadcastNestedLoopJoin in the plan means the filter degraded to the
    // all-pairs shape it exists to avoid
    for (q <- Seq("x106_prefix_jaccard", "x108_containment_join")) {
      val p = planOf(q)
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q:\n" + p.take(2000))
      assert(p.contains("InMemoryTableScan"), s"$q shared frames not cached")
    }
  }

  test("x107 merged stats: the monoid merge is union + one final agg, joinless") {
    val p = planOf("x107_incremental_stats")
    assert(p.contains("Union"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("x109 dup rate: the bucket predicate filters the scan, not the groups") {
    // the sample predicate must sit below the group-by (map-side, next to
    // the scan) so only ~sampled/buckets of the corpus ever shuffles; it
    // filters on the md5 bucket, and the plan has no join at all
    val p = planOf("x109_dup_rate")
    val lines = p.linesIterator.toIndexedSeq
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("md5"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    assert(filterIdx >= 0, "no md5 bucket filter:\n" + p.take(2000))
    assert(exchangeIdx >= 0 && filterIdx > exchangeIdx,
      s"bucket filter above the shuffle (filter@$filterIdx exchange@$exchangeIdx)")
    assert(!p.contains("Join"), p.take(2000))
  }

  test("x112 fingerprint: one aggregation pass, no join, no sort") {
    // the whole point is sort-free equality: per-partition partial XOR →
    // one-row final merge. A Sort or Join appearing here means the
    // fingerprint stopped being the cheap path
    val p = planOf("x112_table_fingerprint")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("Join") && !p.contains("Sort "), p.take(2000))
  }

  test("x110 label outliers: joinless scoring, rank bounded by WindowGroupLimit") {
    // prototypes are broadcast literals (no join anywhere); the per-label
    // bottom-k must pre-filter map-side like every other top-k in the
    // engine
    val p = planOf("x110_label_outliers")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("x115 fuzzy match: candidates come from an equi-join, never a product") {
    // the deletion-neighborhood blocking exists to avoid the all-pairs
    // levenshtein — a CartesianProduct or nested loop here means it
    // degraded to exactly that
    val p = planOf("x115_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("x116 NB classifier: label-bounded frames broadcast, grid joins by hash") {
    // the label-totals and priors frames are #labels rows → broadcast;
    // the vocab×label grid must reach the token stream through a hash
    // join, never a nested loop (the only legitimate product is the
    // vocab × broadcast-labels grid build)
    val p = planOf("x116_nb_classify")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("x117 CDC apply: per-key rank bounded map-side by WindowGroupLimit") {
    // rn = 1 must push a partial top-1 below the shuffle so a hot key's
    // changelog arrives at its reducer pre-pruned
    val p = planOf("x117_cdc_apply")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("x118 PSI drift: bin counts aggregate before the align join") {
    // each side must collapse to (group, bin) counts BEFORE the
    // full-outer align — the exchanges carry ≤ groups×bins rows, never
    // the corpus. HashAggregates below the SMJ prove it.
    val p = planOf("x118_drift_psi")
    val lines = p.linesIterator.toIndexedSeq
    val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, "no full-outer align join:\n" + p.take(2000))
    val aggsBelow = lines.drop(joinIdx).count(_.contains("HashAggregate"))
    assert(aggsBelow >= 2, s"per-side pre-agg missing below the join:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("x120 interleave: every rank window partitions by __pid, never by source alone") {
    // the two-pass rank exists to avoid a per-source single-task window —
    // each Window in the plan must carry the physical partition id next
    // to the group key
    val p = planOf("x120_interleave")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p.take(2000))
    assert(windows.forall(_.contains("__pid")),
      "window without __pid:\n" + windows.mkString("\n"))
  }

  test("x124 distinctive tokens: per-label top-k bounded by WindowGroupLimit") {
    // the grid build's vocab × broadcast-label-totals product is N×L
    // (bounded); an UNBROADCAST CartesianProduct would be the degradation
    val p = planOf("x124_distinctive_tokens")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("x126 label propagation: edges iterate from cache, joins are keyed") {
    val p = planOf("x126_label_prop")
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(2000))
  }

  test("x119 crossdoc dedup: first-occurrence is an aggregation, not a shingle window") {
    // min(struct(doc,pos)) per shingle partial-aggs map-side; the only
    // windows in the plan partition by doc (islands merge), so a hot
    // shingle can never pin one task
    val p = planOf("x119_crossdoc_dedup")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(w => !w.contains("__f")),
      "window over shingle first-occurrence:\n" + windows.mkString("\n"))
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(2000))
  }

  test("x139 join pre-flight: fact tables aggregate BEFORE any join touches them") {
    // the whole point of the estimator is that the row-sized relations
    // never meet: every shuffle/hash join in the plan must sit above an
    // aggregation on both sides (count tables), so the only row-sized
    // work is the two map-side-combined groupBys
    val df = SparkEntry.queries("x139_join_size_estimate")(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    def unwrap(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec        => unwrap(q.plan)
      case other                    => other +: other.children.flatMap(unwrap)
    })
    val nodes = unwrap(df.queryExecution.executedPlan)
    def hasAggBelow(p: SparkPlan): Boolean =
      unwrap(p).exists(_.isInstanceOf[BaseAggregateExec])
    // AQE is free to broadcast the (small) count tables — any equi-join
    // form is fine, as long as both inputs are aggregated
    val keyedJoins = nodes.collect {
      case j: BaseJoinExec if !j.isInstanceOf[BroadcastNestedLoopJoinExec] => j
    }
    assert(keyedJoins.nonEmpty, "expected the count-table equi-join")
    keyedJoins.foreach { j =>
      assert(hasAggBelow(j.left) && hasAggBelow(j.right),
        s"join over un-aggregated input:\n$j")
    }
    // the single-row combiners are broadcast loop joins over 1-row sides
    val bnl = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
    bnl.foreach { j =>
      assert(hasAggBelow(j.left) || hasAggBelow(j.right),
        s"cross combine over un-aggregated input:\n$j")
    }
  }

  test("x146 stable ids: every window is partitioned — no single-task numbering") {
    val df = SparkEntry.queries("x146_stable_ids")(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec        => unwrap(q.plan)
      case other                    => other +: other.children.flatMap(unwrap)
    }
    val windows = unwrap(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the per-partition numbering window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window in the plan:\n$w")
    }
  }
}
