package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** THE cache-lifecycle pattern for operators that persist intermediates.
  *
  * Several operators cache a frame that the rest of the plan references
  * more than once (LSH pair sets feeding both a cluster pass and a pair
  * aggregate, a PQ-decoded index frame probed by every query cell, a
  * cluster map joined back to its corpus). Left alone, each such persist
  * leaks cached blocks into the caller's memory budget: a library user
  * composing these operators in one session accumulates dead cache until
  * something evicts or OOMs.
  *
  * `withMaterialized(inputs)(body)` is the single audited lifecycle:
  *
  *   1. persist every input frame;
  *   2. evaluate `body` (whose plan may reference each input many times —
  *      every reference hits the cache, the expensive pipeline runs once);
  *   3. persist the result and EAGERLY materialize it (`count()`), so its
  *      cached blocks no longer depend on the inputs;
  *   4. unpersist the inputs (non-blocking) and return the result.
  *
  * Contract: the ONLY cached artifact that outlives the call is the
  * returned frame — the caller owns exactly one unpersist. The declared
  * query surface discharges that automatically: `Verify` and `Bench` run
  * `spark.catalog.clearCache()` after every query / rep. Library callers
  * composing operators repeatedly should `unpersist()` each returned frame
  * (or `clearCache()` between compositions) the same way.
  *
  * Ownership is respected, not stolen: an input (or result) that arrives
  * already persisted — e.g. the frame another `withMaterialized` call just
  * returned — is left exactly as cached as it was; the helper persists and
  * unpersists only the frames IT cached. Two sharp edges remain, by
  * design:
  *   - pass only frames the caller does NOT reuse after the call — the
  *     helper unpersists the ones it persisted (re-evaluating them later
  *     is still correct, just uncached);
  *   - if a cached result block is evicted under memory pressure, Spark
  *     recomputes it through the now-uncached input lineage — correctness
  *     is unaffected, the cost is a re-run of that partition's pipeline.
  *
  * At cluster scale the eager `count()` is deliberately cheap relative to
  * `body`: every `withMaterialized` site returns a BOUNDED aggregate
  * (recall flags, pair counts, top-k) — the materialization job IS the
  * operator's action, done once. Sites whose result is corpus-sized and
  * consumed exactly once use [[withCachedInputs]] instead: eagerly
  * persisting + `count()`ing a frame the caller will only ever read once
  * adds a full extra action and floods the executor heap with cached
  * blocks that exist only to be evicted (the round-8 bench regression:
  * x82's full doc×cluster output cached under local[32]'s shared heap
  * evicted its own input cache mid-plan).
  */
object Lifecycle {
  def withMaterialized(inputs: DataFrame*)(body: => DataFrame): DataFrame = {
    val owned = inputs.filter(_.storageLevel == StorageLevel.NONE)
    owned.foreach(_.persist())
    val out = body
    if (out.storageLevel == StorageLevel.NONE) out.persist()
    out.count()
    owned.foreach(_.unpersist(false))
    out
  }

  /** Lazy sibling of [[withMaterialized]] for corpus-sized, SINGLE-consumer
    * results (the declared-query shape: the harness runs exactly one
    * action on the returned frame, then `clearCache()`s).
    *
    * Persists the inputs — the body's plan references each one repeatedly,
    * and the caller's one action populates their cache on first reference
    * and hits it on the rest — but does NOT persist or materialize the
    * result: no extra action, no corpus-sized cache blocks.
    *
    * Contract difference from `withMaterialized`: the INPUT caches outlive
    * the call (they must — the result hasn't been computed yet when we
    * return). Ownership passes to the caller: the declared query surface
    * discharges it via `Verify`/`Bench`'s per-query `clearCache()`;
    * library callers composing operators should do the same (or
    * `unpersist()` the inputs) after consuming the result.
    */
  def withCachedInputs(inputs: DataFrame*)(body: => DataFrame): DataFrame = {
    val owned = inputs.filter(_.storageLevel == StorageLevel.NONE)
    owned.foreach(_.persist())
    // eager: a lazily-persisted input referenced by two PARALLEL downstream
    // stages of the caller's one job can be computed twice (both stages
    // race on the uncached partitions); one count() runs the shared pass
    // exactly once before anything forks off it
    owned.foreach(_.count())
    body
  }
}
